"""Sustained-stream flatness evidence for the O(batch) apply claim
(VERDICT r4 next #4).

The 10^10-event design point requires per-batch APPLY cost independent of
table size. This harness runs a long MOR stream (constant batch size, a
mostly-insert keyspace so the table grows >=10x before plateauing at the
generator's url count) with auto-compaction + snapshot retention on, and
records per batch:

- ``apply_ms``     — the apply_batch wall alone (the O(batch) claim);
- ``maint_ms``     — maybe_compact + expire_snapshots wall (maintenance is
  amortized-O(bucket) work and is reported as its own curve, not folded
  into the apply number and not hidden from it);
- ``rows_stored``  — manifest rows after the batch (table growth);
- ``data_bytes``   — on-disk bytes under data/ (the storage bound);
- ``steal_pct``    — host steal around the batch (noise adjudication).

Flatness is judged on apply_ms: median of the last quarter vs the median
of batches 5..15 (post-JIT), with per-batch steal so a noisy tail is
visible. The maintenance curve is expected to GROW until the keyspace
plateaus (each compaction rewrites a bucket whose size tracks the table)
and flatten after — the artifact shows both phases honestly.

Usage: python BENCH/flatness.py [n_events] [n_segments] [cpus]
Appends one JSON line per batch + a summary line to stdout; the caller
redirects to BENCH/flatness_r5.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from game_library_enrichment_etl_spark.session import get_spark
from game_library_enrichment_etl_spark.cdc.apply import apply_batch
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table
from game_library_enrichment_etl_spark.lake.maintenance import maybe_compact, expire_snapshots

cpus = int(sys.argv[1]); wal = sys.argv[2]

def _steal():
    with open("/proc/stat") as fh:
        v = [int(x) for x in fh.readline().split()[1:]]
    return (v[7] if len(v) > 7 else 0), sum(v)

def _du(d):
    total = 0
    for base, _dirs, fns in os.walk(d):
        for fn in fns:
            try:
                total += os.stat(os.path.join(base, fn)).st_size
            except OSError:
                pass
    return total

spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app_name=f"flatness-{{cpus}}")
segs = sorted(os.path.join(wal, f) for f in os.listdir(wal) if f.startswith("seg-"))
root = tempfile.mkdtemp(prefix="flatness_")

# full-pipeline warm-up on a throwaway table (JIT, python workers, writer)
warm = create_pages_table(spark, os.path.join(root, "warm"), n_buckets=32,
                          merge_strategy="mor")
apply_batch(warm, spark.read.parquet(segs[0]).limit(20_000))

t = create_pages_table(spark, os.path.join(root, "pages"), n_buckets=32,
                       merge_strategy="mor")
datadir = os.path.join(root, "pages", "data")
for i, p in enumerate(segs):
    s0, c0 = _steal()
    t0 = time.monotonic()
    res = apply_batch(t, spark.read.parquet(p))
    apply_ms = int((time.monotonic() - t0) * 1000)
    t1 = time.monotonic()
    comp = maybe_compact(t, max_files_per_bucket=8)
    exp = expire_snapshots(t, keep_last=3, orphan_grace_s=3600.0)
    maint_ms = int((time.monotonic() - t1) * 1000)
    s1, c1 = _steal()
    print(json.dumps({{
        "batch": i,
        "events": res.metrics.get("events_in"),
        "apply_ms": apply_ms,
        "maint_ms": maint_ms,
        "compacted_buckets": (comp or {{}}).get("buckets", 0),
        "rows_stored": res.metrics.get("rows_after"),
        "data_bytes": _du(datadir),
        "snapshots_retained": exp["snapshots_retained"],
        "steal_pct": round(100.0 * (s1 - s0) / max(c1 - c0, 1), 1),
    }}), flush=True)
shutil.rmtree(root, ignore_errors=True)
spark.stop()
"""


def _median(xs):
    ys = sorted(xs)
    n = len(ys)
    return ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_seg = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling import gen_wal

    wal = gen_wal(n_events, n_seg)
    env = dict(os.environ, SPARK_DRIVER_MEMORY="32g")
    proc = subprocess.Popen(
        [sys.executable, "-c", _WORKER.format(repo=REPO), str(cpus), wal],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    rows = []
    for line in proc.stdout:
        line = line.strip()
        if not line.startswith("{"):
            continue
        rows.append(json.loads(line))
        print(line, flush=True)
    proc.wait()
    if proc.returncode != 0 or not rows:
        print(json.dumps({"error": f"worker exit {proc.returncode}"}), flush=True)
        return

    early = [r for r in rows[5:16]]
    late = rows[-(len(rows) // 4):]
    med_early = _median([r["apply_ms"] for r in early])
    med_late = _median([r["apply_ms"] for r in late])
    growth = rows[-1]["rows_stored"] / max(rows[0]["rows_stored"], 1)
    print(json.dumps({
        "summary": "flatness",
        "n_batches": len(rows),
        "events_per_batch": rows[0]["events"],
        "apply_ms_median_batches_5_15": med_early,
        "apply_ms_median_last_quarter": med_late,
        "apply_flatness_ratio": round(med_late / max(med_early, 1), 3),
        "maint_ms_median_batches_5_15": _median([r["maint_ms"] for r in early]),
        "maint_ms_median_last_quarter": _median([r["maint_ms"] for r in late]),
        "rows_first_batch": rows[0]["rows_stored"],
        "rows_final": rows[-1]["rows_stored"],
        "table_growth_x": round(growth, 1),
        "data_bytes_max": max(r["data_bytes"] for r in rows),
        "data_bytes_final": rows[-1]["data_bytes"],
        "steal_pct_max": max(r["steal_pct"] for r in rows),
        "cpus": cpus,
    }), flush=True)
    import shutil

    shutil.rmtree(wal, ignore_errors=True)


if __name__ == "__main__":
    main()
