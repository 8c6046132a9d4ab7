"""Distributed change-stream generator (Spark-side) for benchmark scale.

The pandas generator (datagen.py) is exact and feature-complete but
driver-bound; this one generates tens of millions of events in parallel
with deterministic per-row arithmetic (everything derived from the row id
via xxhash64 — no rand(), so the output is identical regardless of
parallelism). Used by BENCH/scaling.py and large bench runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "data stream merge table page crawl web index shard batch commit snapshot "
    "upsert delete insert schema column lineage metric offset watermark"
).split()


def gen_stream_spark(
    spark: SparkSession,
    out_dir: str,
    n_events: int = 8_000_000,
    n_urls: int = 1_000_000,
    n_segments: int = 4,
    n_domains: int = 1000,
    delete_frac_mod: int = 20,  # 1/20 of updates are deletes
    seed: int = 42,
) -> list[str]:
    """Write ``n_segments`` parquet segment files of deterministic change
    events. Zipf-ish domain skew via a quadratic hash transform; html is a
    few hundred bytes of template + per-row words."""
    df = spark.range(n_events).select(F.col("id").alias("lsn"))
    h = F.abs(F.xxhash64(F.col("lsn") + F.lit(seed)))
    # quadratic transform concentrates urls on low ids -> hot keys
    u = F.pmod(h, F.lit(n_urls * n_urls)).cast("double")
    url_id = F.floor(F.sqrt(u)).cast("long")
    dom = F.pmod(F.xxhash64(url_id), F.lit(n_domains))
    url = F.concat(
        F.lit("https://site"), dom.cast("string"), F.lit(".example.com/p/"),
        url_id.cast("string"),
    )
    is_del = (F.pmod(h, F.lit(delete_frac_mod)) == 0) & (F.col("lsn") > n_events // 10)
    op = F.when(is_del, F.lit("D")).otherwise(F.lit("U"))  # U==upsert (I/U unified)
    jitter = F.pmod(F.xxhash64(F.col("lsn") * 7 + 13), F.lit(61)) - 30
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + F.col("lsn") + jitter)
    w1 = F.element_at(F.array(*[F.lit(w) for w in _WORDS]), (F.pmod(h, F.lit(len(_WORDS))) + 1).cast("int"))
    body = F.concat(
        F.lit("<html><head><title>"), w1, F.lit(" page "), url_id.cast("string"),
        F.lit("</title><style>b{}</style></head><body><script>var v="),
        F.col("lsn").cast("string"),
        F.lit(";</script><p>"),
        F.repeat(F.concat(w1, F.lit(" ")), 40),
        F.lit("version "), F.col("lsn").cast("string"),
        F.lit(" &amp; tail</p></body></html>"),
    )
    html = F.when(~is_del, F.encode(body, "utf-8"))
    lang = F.when(~is_del, F.element_at(F.array(*[F.lit(x) for x in ["en", "de", "fr", "es"]]),
                                        (F.pmod(h, F.lit(4)) + 1).cast("int")))
    batch = F.floor(F.col("lsn") * n_segments / F.lit(n_events)).cast("bigint")
    out = df.select(
        op.alias("op"), F.col("lsn"), url.alias("url"), ts.alias("warc_ts"),
        html.alias("html"), lang.alias("lang"), batch.alias("batch_id"),
    )
    paths = []
    for k in range(n_segments):
        p = os.path.join(out_dir, f"seg-{k:05d}")
        # bounded row groups: a WAL producer tuned for parallel downstream
        # consumption writes row groups well under the split size — the row
        # group is the scan's atomic parallelism unit, and the default
        # 128MB buffer produced files of ONE ~330MB-uncompressed group
        # (plus a runt), so consumers could not split them and split
        # boundaries created 2-3x task skew (BENCH/stageprof 96M: exchange
        # max task 7.7s vs 4.6s mean). 32MB uncompressed ~ a few MB on
        # disk keeps packing even at any maxPartitionBytes.
        (
            out.where(F.col("batch_id") == k)
            .write.mode("overwrite")
            .option("parquet.block.size", str(32 << 20))
            .parquet(p)
        )
        paths.append(p)
    return paths
