"""Decompose ngram_jaccard_pairs stage costs with noop sinks (guide §1.4).

Times, in one warmed session over the full sf documents table:
  grams      — per-doc hashed gram arrays only
  eg         — exploded (k, gram)
  dfreq      — gram -> document frequency
  per_doc    — df-sorted gram list per doc
  cand       — candidate pairs after prefix join + size filter + dedup
  full       — the complete operator
plus row counts for cand/full.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from game_library_enrichment_etl_spark.functions.text import token_hash  # noqa: E402
from game_library_enrichment_etl_spark.operators.dedup import (  # noqa: E402
    char_ngrams,
    ngram_jaccard_pairs,
)
from game_library_enrichment_etl_spark.session import get_spark  # noqa: E402


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n, threshold = 5, 0.7
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus),
                      app_name="decompose-ngram")
    spark.range(1000).count()
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    nparts = spark.sparkContext.defaultParallelism
    src = df.select(F.col("doc_id").alias("k"), F.col("text").alias("t")).repartition(nparts, "k")
    grams = src.select("k", F.transform(char_ngrams(F.col("t"), n), token_hash).alias("g"))
    eg = grams.select("k", F.explode("g").alias("gram"))
    dfreq = eg.groupBy("gram").agg(F.count(F.lit(1)).alias("dfc"))
    ranked = eg.join(dfreq, "gram")
    per_doc = ranked.groupBy("k").agg(
        F.array_sort(F.collect_list(F.struct(F.col("dfc"), F.col("gram")))).alias("sg")
    )
    sz = F.size("sg")
    plen = sz - F.ceil(F.lit(threshold) * sz).cast("int") + 1
    prefix = per_doc.select(
        "k", sz.alias("sz"),
        F.slice(F.transform("sg", lambda x: x.getField("gram")), 1, plen).alias("pref"),
    )
    pe = prefix.select("k", "sz", F.explode("pref").alias("gram"))
    cand = (
        pe.alias("a").join(pe.alias("b"), "gram")
        .where(F.col("a.k") < F.col("b.k"))
        .where(
            (F.col("a.sz").cast("double") >= threshold * F.col("b.sz"))
            & (F.col("b.sz").cast("double") >= threshold * F.col("a.sz"))
        )
        .select(F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b"))
        .dropDuplicates(["key_a", "key_b"])
    )
    out = {}
    stages = [
        ("grams", grams), ("eg", eg), ("dfreq", dfreq),
        ("per_doc", per_doc), ("cand", cand),
        ("full", ngram_jaccard_pairs(df, n=n, threshold=threshold)),
    ]
    # warm once with the full operator so JIT is paid before stage timings
    spark.sparkContext.setJobDescription("warm")
    _force(ngram_jaccard_pairs(df, n=n, threshold=threshold))
    for name, d in stages:
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        _force(d)
        out[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    out["cand_rows"] = cand.count()
    out["full_rows"] = ngram_jaccard_pairs(df, n=n, threshold=threshold).count()
    out["docs"] = df.count()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
