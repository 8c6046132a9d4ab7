"""Profile the CDC apply loop exactly as bench.py times it, printing
per-batch phase timings (apply.py metrics.phases_s) and compaction wall.

Usage: python tools/profile_cdc.py [mor|cow] [n_segments]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as E  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from game_library_enrichment_etl_spark.cdc.apply import apply_batch  # noqa: E402
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table  # noqa: E402
from game_library_enrichment_etl_spark.lake.maintenance import maybe_compact  # noqa: E402
from game_library_enrichment_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    strategy = sys.argv[1] if len(sys.argv) > 1 else "mor"
    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus),
                      app_name=f"profile-cdc-{strategy}")
    spark.range(1000).count()

    stream = E._derive_change_stream(spark, sf_dir).withColumn(
        "batch_id", F.pmod(F.col("lsn"), F.lit(n_segments)).cast("bigint")
    )
    n_events = stream.count()
    root = tempfile.mkdtemp(prefix="icelet_prof_")
    wtable = create_pages_table(
        spark, os.path.join(root, "warm"), n_buckets=32, merge_strategy=strategy
    )
    apply_batch(wtable, stream.where(F.col("batch_id") == 0))
    table = create_pages_table(
        spark, os.path.join(root, "pages"), n_buckets=32, merge_strategy=strategy
    )
    t0 = time.monotonic()
    batches = []
    for b in range(n_segments):
        tb = time.monotonic()
        res = apply_batch(table, stream.where(F.col("batch_id") == b))
        t_apply = time.monotonic() - tb
        tc = time.monotonic()
        comp = None
        if strategy == "mor":
            comp = maybe_compact(table, max_files_per_bucket=8)
        t_comp = time.monotonic() - tc
        batches.append({
            "b": b, "apply_s": round(t_apply, 3), "compact_s": round(t_comp, 3),
            "compacted": bool(comp), "phases": res.metrics.get("phases_s"),
            "winners": res.metrics.get("winners"),
        })
        print(json.dumps(batches[-1]), flush=True)
    dt = time.monotonic() - t0
    t1 = time.monotonic()
    live_rows = table.read().count()
    read_sec = time.monotonic() - t1
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "strategy": strategy, "total_s": round(dt, 3), "events": n_events,
        "events_per_sec": round(n_events / dt, 1),
        "read_after_s": round(read_sec, 3), "live_rows": live_rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
