"""Profile one apply_batch with Spark event logs: exact per-stage wall and
task-time at two parallelism levels, so the non-scaling component of
t_merge_write is located by measurement instead of micro-bench guesswork.

Usage: python BENCH/profile_apply.py [n_events] [lo] [hi] [strategy]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from game_library_enrichment_etl_spark.session import get_spark
from game_library_enrichment_etl_spark.cdc.apply import apply_batch
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table

cpus = int(sys.argv[1]); wal = sys.argv[2]; strategy = sys.argv[3]
evlog = sys.argv[4]
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app_name=f"profile-{{cpus}}",
                  extra_conf={{"spark.eventLog.enabled": "true",
                              "spark.eventLog.compress": "false",
                              "spark.eventLog.dir": evlog}})
segs = sorted(os.path.join(wal, f) for f in os.listdir(wal) if f.startswith("seg-"))

root = tempfile.mkdtemp(prefix=f"prof_{{cpus}}_")
wtable = create_pages_table(spark, os.path.join(root, "warm"), n_buckets=32,
                            merge_strategy=strategy)
apply_batch(wtable, spark.read.parquet(segs[0]).limit(50_000))

table = create_pages_table(spark, os.path.join(root, "pages"), n_buckets=32,
                           merge_strategy=strategy)
spark.sparkContext.setJobGroup("timed", "timed apply")
t0 = time.monotonic()
res = apply_batch(table, spark.read.parquet(segs[0]))
dt = time.monotonic() - t0
shutil.rmtree(root, ignore_errors=True)
print(json.dumps({{"cpus": cpus, "apply_s": round(dt, 2),
                   "phases": res.metrics.get("phases_s"),
                   "winners": res.metrics.get("winners")}}))
spark.stop()
"""


def parse_eventlog(evdir: str) -> list[dict]:
    import glob

    logs = sorted(glob.glob(os.path.join(evdir, "**", "events_*")) +
                  [p for p in glob.glob(os.path.join(evdir, "*")) if os.path.isfile(p)],
                  key=os.path.getmtime)
    path = logs[-1]
    stages = []
    opener = open
    if path.endswith(".zstd"):
        import zstandard  # pragma: no cover - depends on codec in use

        def opener(p):
            return zstandard.ZstdDecompressor().stream_reader(open(p, "rb"))
    with opener(path) as fh:
        import io
        fh = io.TextIOWrapper(fh) if not hasattr(fh, "readline") or "b" in getattr(fh, "mode", "t") else fh
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                name = si.get("Stage Name", "?")
                tasks = si.get("Number of Tasks")
                stages.append(
                    {
                        "stage": si.get("Stage ID"),
                        "name": name.split("\n")[0][:70],
                        "tasks": tasks,
                        "wall_s": round((comp - sub) / 1000.0, 2) if sub and comp else None,
                    }
                )
    return stages


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    strategy = sys.argv[4] if len(sys.argv) > 4 else "mor"

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling import gen_wal

    wal = gen_wal(n_events, 1)
    for cpus in (lo, hi):
        evdir = tempfile.mkdtemp(prefix=f"evlog_{cpus}_")
        env = dict(os.environ, SPARK_DRIVER_MEMORY="32g")
        out = subprocess.run(
            [sys.executable, "-c", _WORKER.format(repo=REPO),
             str(cpus), wal, strategy, evdir],
            capture_output=True, text=True, check=True, env=env,
        )
        print(out.stdout.strip().splitlines()[-1], flush=True)
        stages = parse_eventlog(evdir)
        # report only stages with wall >= 0.2s, in submission order
        big = [s for s in stages if (s["wall_s"] or 0) >= 0.2]
        for s in big:
            print(f"  [{cpus}c] stage {s['stage']:>3} {s['wall_s']:>7.2f}s "
                  f"tasks={s['tasks']:<4} {s['name']}", flush=True)


if __name__ == "__main__":
    main()
