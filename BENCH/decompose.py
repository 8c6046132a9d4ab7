"""Decompose t_merge_write scaling: which sub-phase fails to scale 2->8 cores?

Round-2 verdict: the apply loop's merge-write phase ran 88s (local[2]) ->
69s (local[8]) — 1.28x on 4x cores — while both stats phases scaled ~3x.
This harness times cumulative slices of the MOR write path in fresh JVMs at
two parallelism levels so the non-scaling component is isolated instead of
guessed:

  p1_dedup        skinny LWW agg + SHUFFLE_HASH payload fetch join -> noop
  p2_extract      p1 + Arrow html->text extraction UDF             -> noop
  p3_shuffle      p1 + bucket repartition + sort + extraction      -> noop
  p4_write        the full current path (p3 + parquet encode+disk)
  p5_purewrite    winners pre-materialized to parquet, then read ->
                  repartition -> sort -> extract -> write (bounds the
                  write stage alone, no dedup upstream)

Usage: python BENCH/decompose.py [n_events] [lo] [hi]
Prints one JSON line per (level, phase).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from game_library_enrichment_etl_spark.session import get_spark
from game_library_enrichment_etl_spark.functions.extract import extract_text_udf
from game_library_enrichment_etl_spark.operators.lww import lww_dedup
from game_library_enrichment_etl_spark.lake.table import bucket_expr, BUCKET_COL
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); wal = sys.argv[2]; phase = sys.argv[3]
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app_name=f"decompose-{{cpus}}-{{phase}}")
N_BUCKETS = 32

def winners_of(df):
    w = lww_dedup(df.drop("batch_id"), "url", ("warc_ts", "lsn"),
                  strategy="skinny", unique_versions=True)
    is_del = F.col("op") == "D"
    return w.select(
        F.col("url"), F.col("warc_ts"), F.col("lsn"),
        F.when(is_del, F.lit(None).cast("binary")).otherwise(F.col("html")).alias("html"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(F.col("lang")).alias("lang"),
        is_del.alias("_deleted"),
    )

def extract(df):
    return df.withColumn(
        "text",
        F.when(~F.col("_deleted"), extract_text_udf(F.col("html"))).cast("string"),
    )

def staged_of(df):
    out = winners_of(df).withColumn(BUCKET_COL, bucket_expr("url", N_BUCKETS))
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return extract(out.repartition(nparts, BUCKET_COL)
                      .sortWithinPartitions(BUCKET_COL, "url"))

def noop(df):
    df.write.format("noop").mode("overwrite").save()

segs = sorted(os.path.join(wal, f) for f in os.listdir(wal) if f.startswith("seg-"))
df = spark.read.parquet(*segs)

# warm: run the phase once on a 50k slice (JIT + python workers)
warm = df.limit(50_000)
out_root = tempfile.mkdtemp(prefix=f"decomp_{{cpus}}_")

def run(d, sink_dir=None):
    if phase == "p1_dedup":
        noop(winners_of(d))
    elif phase == "p2_extract":
        noop(extract(winners_of(d)))
    elif phase == "p3_shuffle":
        noop(staged_of(d))
    elif phase == "p8_repart_sort":
        out = winners_of(d).withColumn(BUCKET_COL, bucket_expr("url", N_BUCKETS))
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        noop(out.repartition(nparts, BUCKET_COL).sortWithinPartitions(BUCKET_COL, "url"))
    elif phase == "p9_repart_only":
        out = winners_of(d).withColumn(BUCKET_COL, bucket_expr("url", N_BUCKETS))
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        noop(out.repartition(nparts, BUCKET_COL))
    elif phase == "p4_write":
        staged_of(d).write.mode("overwrite").partitionBy(BUCKET_COL).parquet(sink_dir)
    else:
        raise SystemExit(f"unknown phase {{phase}}")

REPS = int(os.environ.get("DECOMP_REPS", "3"))


def timed(fn):
    outs = []
    for _ in range(REPS):
        t0 = time.monotonic()
        fn()
        outs.append(round(time.monotonic() - t0, 2))
    return outs


nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))

# pre-materialized winners for the post-dedup phases
pre = os.path.join(out_root, "pre")
winners_of(df).write.parquet(pre)
w = spark.read.parquet(pre)
wb = w.withColumn(BUCKET_COL, bucket_expr("url", N_BUCKETS))


def pwrite(d, name):
    d.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
        os.path.join(out_root, name))


POST = {{
    "p5_purewrite": lambda d: pwrite(
        extract(d.repartition(nparts, BUCKET_COL)
                 .sortWithinPartitions(BUCKET_COL, "url")), "out"),
    "p6_extract_only": lambda d: noop(extract(d)),
    "p7_read_only": lambda d: noop(d),
    "p8_repart_sort": lambda d: noop(
        d.repartition(nparts, BUCKET_COL).sortWithinPartitions(BUCKET_COL, "url")),
    "p9_repart_only": lambda d: noop(d.repartition(nparts, BUCKET_COL)),
    "p10_sort_nokey": lambda d: noop(
        d.repartition(nparts, BUCKET_COL).sortWithinPartitions(BUCKET_COL)),
    "p11_write_nosort": lambda d: pwrite(
        extract(d.repartition(nparts, BUCKET_COL)), "out"),
    "p12_write_norepart": lambda d: pwrite(extract(d), "out"),
}}

if phase in POST:
    fn = POST[phase]
    fn(wb.limit(50_000))  # warm
    reps = timed(lambda: fn(wb))
else:
    run(warm, os.path.join(out_root, "warm"))
    reps = timed(lambda: run(df, os.path.join(out_root, "out")))

shutil.rmtree(out_root, ignore_errors=True)
print(json.dumps({{"cpus": cpus, "phase": phase, "sec": min(reps), "reps": reps}}))
spark.stop()
"""

PHASES = ["p1_dedup", "p2_extract", "p3_shuffle", "p4_write", "p5_purewrite"]


def run_one(cpus: int, wal: str, phase: str) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEMORY="32g")
    out = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=REPO), str(cpus), wal, phase],
        capture_output=True, text=True, check=True, env=env,
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    os.sync()
    time.sleep(3)
    return r


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    phases = sys.argv[4].split(",") if len(sys.argv) > 4 else PHASES

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling import gen_wal

    wal = gen_wal(n_events, 1)
    results = {}
    for phase in phases:
        for cpus in (lo, hi):
            r = run_one(cpus, wal, phase)
            results[(phase, cpus)] = r["sec"]
            print(json.dumps(r), flush=True)
    print("---- scaling per phase ----", file=sys.stderr)
    for phase in phases:
        a, b = results.get((phase, lo)), results.get((phase, hi))
        if a and b:
            print(f"{phase}: {a}s -> {b}s  speedup={a/b:.2f}x  eff={(a/b)/(hi/lo):.2f}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
