"""Per-stage decomposition of the scaling job via the Spark event log.

Quiet-host attempts still show poor 2->8 scaling (0.30-0.47) with large
run-to-run variance that is neither steal, foreign CPU, GC (jvm_gc_s ~1s),
nor physical disk. Amdahl fits over whole phases mis-attributed it (the
input-split fix changed nothing measurable). This harness runs the exact
scaling workload at one level with spark.eventLog enabled and reports, per
stage: name, task count, wall (submission->completion), summed task time,
max task time, and shuffle/spill bytes — so the non-scaling stage is read
off instead of inferred.

Usage: python BENCH/stage_profile.py [cpus] [wal_dir] [n_seg] [strategy]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, shutil, sys, time, tempfile
sys.path.insert(0, os.environ["PROF_REPO"])
from game_library_enrichment_etl_spark.session import get_spark
from game_library_enrichment_etl_spark.cdc.apply import apply_batch
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table
from game_library_enrichment_etl_spark.sources.readers import read_change_batch

cpus = int(sys.argv[1]); wal = sys.argv[2]; n_seg = int(sys.argv[3])
strategy = sys.argv[4]; evdir = sys.argv[5]
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  app_name=f"stageprof-{cpus}",
                  extra_conf={"spark.eventLog.enabled": "true",
                              "spark.eventLog.dir": evdir,
                              "spark.eventLog.compress": "false",
                              "spark.eventLog.rolling.enabled": "false"})
segs = sorted(os.path.join(wal, f) for f in os.listdir(wal) if f.startswith("seg-"))
wroot = tempfile.mkdtemp(prefix="prof_warm_")
wtable = create_pages_table(spark, os.path.join(wroot, "pages"), n_buckets=32,
                            merge_strategy=strategy)
apply_batch(wtable, read_change_batch(spark, segs[0]).limit(50_000))
shutil.rmtree(wroot, ignore_errors=True)
root = tempfile.mkdtemp(prefix="prof_scale_")
table = create_pages_table(spark, os.path.join(root, "pages"), n_buckets=32,
                           merge_strategy=strategy)
t0 = time.monotonic()
per_batch = []
for i, p in enumerate(segs):
    spark.sparkContext.setJobGroup(f"batch-{i}", p)
    res = apply_batch(table, read_change_batch(spark, p))
    m = res.metrics
    per_batch.append({"batch": i,
                      "events_in": m.get("events_in"),
                      "winners": m.get("n_winners"),
                      "deletes": m.get("n_deletes"),
                      "wall_ms": m.get("wall_ms"),
                      "phases_s": m.get("phases_s")})
dt = time.monotonic() - t0
shutil.rmtree(root, ignore_errors=True)
print(json.dumps({"wall_s": round(dt, 1), "per_batch": per_batch}))
spark.stop()
"""


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    wal = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_wal_ur1qe_lq"
    n_seg = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    strategy = sys.argv[4] if len(sys.argv) > 4 else "mor"
    evdir = tempfile.mkdtemp(prefix="evlog_")
    env = dict(os.environ, SPARK_DRIVER_MEMORY="32g", PROF_REPO=REPO)
    pinned = 2 * cpus
    cmd = ["taskset", "-c", f"0-{pinned - 1}", sys.executable, "-c", _WORKER,
           str(cpus), wal, str(n_seg), strategy, evdir]
    env["SPARK_SUBMIT_OPTS"] = f"-XX:ActiveProcessorCount={pinned}"
    out = subprocess.run(cmd, capture_output=True, text=True, env=env)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        sys.exit(1)
    print(out.stdout.strip().splitlines()[-1])

    cands = [p for p in glob.glob(os.path.join(evdir, "*")) if os.path.isfile(p)]
    if not cands:  # rolling v2 layout: a directory holding events_* files
        cands = [p for d in glob.glob(os.path.join(evdir, "*"))
                 for p in glob.glob(os.path.join(d, "events_*"))]
    ev = cands[0]
    stages = {}  # (stageId, attempt) -> record
    tasks = {}
    stage_group = {}  # stageId -> job group
    for line in open(ev):
        e = json.loads(line)
        t = e.get("Event")
        if t == "SparkListenerJobStart":
            grp = (e.get("Properties") or {}).get("spark.jobGroup.id", "")
            for sid in e.get("Stage IDs", []):
                stage_group[sid] = grp
        if t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            k = (si["Stage ID"], si["Stage Attempt ID"])
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            stages[k] = {
                "stage": si["Stage ID"],
                "grp": stage_group.get(si["Stage ID"], ""),
                "name": si["Stage Name"].split("\n")[0][:40],
                "tasks": si["Number of Tasks"],
                "wall_s": round((comp - sub) / 1000, 2) if sub and comp else None,
            }
        elif t == "SparkListenerTaskEnd":
            k = (e["Stage ID"], e["Stage Attempt ID"])
            m = e.get("Task Metrics") or {}
            rec = tasks.setdefault(k, {"run_s": 0.0, "max_s": 0.0, "gc_s": 0.0,
                                       "spill_mb": 0.0, "sh_write_mb": 0.0,
                                       "ser_s": 0.0, "deser_s": 0.0,
                                       "py_s": 0.0})
            run = m.get("Executor Run Time", 0) / 1000
            rec["run_s"] += run
            rec["max_s"] = max(rec["max_s"], run)
            rec["gc_s"] += m.get("JVM GC Time", 0) / 1000
            rec["ser_s"] += m.get("Result Serialization Time", 0) / 1000
            rec["deser_s"] += m.get("Executor Deserialize Time", 0) / 1000
            rec["spill_mb"] += (m.get("Memory Bytes Spilled", 0)
                                + m.get("Disk Bytes Spilled", 0)) / 1e6
            sw = (m.get("Shuffle Write Metrics") or {})
            rec["sh_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
    rows = []
    for k, s in stages.items():
        s.update({kk: round(vv, 2) for kk, vv in tasks.get(k, {}).items()})
        rows.append(s)
    rows.sort(key=lambda r: -(r["wall_s"] or 0))
    total_wall = sum(r["wall_s"] or 0 for r in rows)
    print(json.dumps({"cpus": cpus, "stage_wall_sum_s": round(total_wall, 1),
                      "n_stages": len(rows)}))
    for r in rows[:20]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
