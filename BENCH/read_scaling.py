"""MOR read-resolve scaling: locate the real limiter by size sweep
(VERDICT r4 next #3 second half, and perf_weak #2).

Round 4 measured read-after 2->8-core ratios of 0.59-0.64 and ASSERTED a
single-disk parquet-bandwidth ceiling. Round 5's diskstats sampling
refuted that: device utilization during the read is ~0-2% (the table was
just written — it reads from page cache). The competing hypotheses:

- FIXED OVERHEAD (Amdahl): the read-after is a short job (2.5-6 s); JVM
  job submission + stage scheduling + count coordination cost ~1-1.5 s
  regardless of cores, capping small-job efficiency. Prediction:
  efficiency RISES with table size.
- MEMORY BANDWIDTH: 8 threads streaming page-cached parquet + shuffle
  saturate DRAM. Prediction: efficiency is FLAT (or falls) with size.

This harness builds an UNCOMPACTED MOR table once per size (local[32],
fast; auto-compaction off so the read pays full LWW resolution over many
delta sequences), then times `table.read().count()` in fresh JVMs at
local[lo] / local[hi], interleaved best-of, per-run steal + disk sampled.
The artifact reports efficiency per size and which prediction held.

Usage: python BENCH/read_scaling.py [lo] [hi] [sizes_csv] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BUILD = r"""
import json, os, sys, tempfile
sys.path.insert(0, {repo!r})
from game_library_enrichment_etl_spark.session import get_spark
from game_library_enrichment_etl_spark.cdc.apply import apply_batch
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table

wal, root = sys.argv[1], sys.argv[2]
spark = get_spark(master="local[32]", shuffle_partitions=32, app_name="read-sc-build")
t = create_pages_table(spark, root, n_buckets=32, merge_strategy="mor")
segs = sorted(os.path.join(wal, f) for f in os.listdir(wal) if f.startswith("seg-"))
for p in segs:
    apply_batch(t, spark.read.parquet(p))
snap = t.snapshot()
seqs = len({{f.sequence for f in snap.files}})
print(json.dumps({{"rows_stored": snap.total_rows(), "files": len(snap.files),
                  "sequences": seqs}}))
spark.stop()
"""

_READ = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from game_library_enrichment_etl_spark.session import get_spark
from game_library_enrichment_etl_spark.lake.table import IceletTable

cpus, root = int(sys.argv[1]), sys.argv[2]

def _dsample(dev="vda"):
    with open("/proc/diskstats") as fh:
        for line in fh:
            p = line.split()
            if p[2] == dev:
                return (int(p[5]) * 512, int(p[9]) * 512, int(p[12]))
    return (0, 0, 0)

spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app_name=f"read-sc-{{cpus}}")
t = IceletTable(spark, root)
t.read().limit(1000).count()  # warm JIT/codegen on a tiny slice
d0 = _dsample()
t0 = time.monotonic()
live = t.read().count()
sec = time.monotonic() - t0
r1, w1, io1 = _dsample()
print(json.dumps({{"cpus": cpus, "read_s": round(sec, 2), "live_rows": live,
                   "disk_read_mb": round((r1 - d0[0]) / 1e6, 1),
                   "disk_util_pct": round(100.0 * (io1 - d0[2]) / max(sec * 1000, 1e-9), 1)}}))
spark.stop()
"""


def _steal():
    with open("/proc/stat") as fh:
        v = [int(x) for x in fh.readline().split()[1:]]
    return (v[7] if len(v) > 7 else 0), sum(v)


def run_read(cpus: int, root: str) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEMORY="32g")
    s0, c0 = _steal()
    out = subprocess.run(
        [sys.executable, "-c", _READ.format(repo=REPO), str(cpus), root],
        capture_output=True, text=True, check=True, env=env,
    )
    s1, c1 = _steal()
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["host_steal_pct"] = round(100.0 * (s1 - s0) / max(c1 - c0, 1), 1)
    time.sleep(5)
    return r


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sizes = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "8000000,24000000").split(",")]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling import gen_wal

    results = []
    for n_events in sizes:
        wal = gen_wal(n_events, 8)
        root = tempfile.mkdtemp(prefix=f"read_sc_{n_events}_") + "/pages"
        build = subprocess.run(
            [sys.executable, "-c", _BUILD.format(repo=REPO), wal, root],
            capture_output=True, text=True, check=True,
            env=dict(os.environ, SPARK_DRIVER_MEMORY="32g"),
        )
        meta = json.loads(build.stdout.strip().splitlines()[-1])
        print(json.dumps({"built": n_events, **meta}), flush=True)
        best: dict[int, dict] = {}
        for _ in range(reps):
            for cpus in (lo, hi):
                r = run_read(cpus, root)
                r["n_events"] = n_events
                print(json.dumps(r), flush=True)
                if cpus not in best or r["read_s"] < best[cpus]["read_s"]:
                    best[cpus] = r
        eff = (best[lo]["read_s"] / best[hi]["read_s"]) / (hi / lo)
        results.append({
            "n_events": n_events, **meta,
            "lo_read_s": best[lo]["read_s"], "hi_read_s": best[hi]["read_s"],
            "efficiency": round(eff, 3),
            "lo_disk_util_pct": best[lo]["disk_util_pct"],
            "hi_disk_util_pct": best[hi]["disk_util_pct"],
            "lo_steal": best[lo]["host_steal_pct"],
            "hi_steal": best[hi]["host_steal_pct"],
        })
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        shutil.rmtree(wal, ignore_errors=True)
    effs = [r["efficiency"] for r in results]
    print(json.dumps({
        "summary": "read_resolve_scaling_by_size",
        "levels": [lo, hi],
        "per_size": results,
        "efficiency_rises_with_size": effs == sorted(effs) and len(effs) > 1
                                       and effs[-1] > effs[0] + 0.05,
        "interpretation": (
            "fixed-overhead (Amdahl) limited at small sizes"
            if len(effs) > 1 and effs[-1] > effs[0] + 0.05
            else "efficiency flat with size: points at a shared-resource ceiling"
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
