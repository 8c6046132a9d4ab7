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
import threading

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
xconf = {"spark.eventLog.enabled": "true",
         "spark.eventLog.dir": evdir,
         "spark.eventLog.compress": "false",
         "spark.eventLog.rolling.enabled": "false"}
xconf.update(json.loads(os.environ.get("PROF_EXTRA_CONF", "{}")))
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  app_name=f"stageprof-{cpus}", extra_conf=xconf)
segs = sorted(os.path.join(wal, f) for f in os.listdir(wal) if f.startswith("seg-"))
wroot = tempfile.mkdtemp(prefix="prof_warm_")
wtable = create_pages_table(spark, os.path.join(wroot, "pages"), n_buckets=32,
                            merge_strategy=strategy)
apply_batch(wtable, read_change_batch(spark, segs[0]))  # full seg: identical codegen (see scaling.py)
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


class _CommCpuSampler(threading.Thread):
    """Sample the worker's process tree once a second and attribute
    utime/stime CPU-seconds by executable (java vs python vs other).
    Separates JVM compute inflation (shuffle/sort/parquet) from Python
    Arrow-worker inflation (extraction) — the event log only sees the JVM
    side, and a JVM task thread blocked on a python worker shows up as
    run-time-minus-cpu-time, not as CPU."""

    def __init__(self, root_pid: int):
        super().__init__(daemon=True)
        self.root = root_pid
        self.stop_evt = threading.Event()
        self.ours: set[int] = {root_pid}
        self.cpu_max: dict[int, tuple[str, int, int]] = {}  # pid -> (comm, u, s)

    def _sample(self) -> None:
        snap: dict[int, tuple[int, str, int, int]] = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat", "rb") as fh:
                    s = fh.read().decode("utf-8", "replace")
            except OSError:
                continue
            comm = s[s.find("(") + 1:s.rfind(")")]
            rest = s[s.rfind(")") + 2:].split()
            snap[int(pid)] = (int(rest[1]), comm, int(rest[11]), int(rest[12]))
        kids: dict[int, list[int]] = {}
        for pid, (ppid, *_rest) in snap.items():
            kids.setdefault(ppid, []).append(pid)
        stack = list(self.ours)
        seen: set[int] = set()
        while stack:
            p = stack.pop()
            if p in seen:
                continue
            seen.add(p)
            self.ours.add(p)
            stack.extend(kids.get(p, []))
        for pid in self.ours:
            if pid in snap:
                _, comm, u, st = snap[pid]
                prev = self.cpu_max.get(pid)
                if prev is None or u + st > prev[1] + prev[2]:
                    self.cpu_max[pid] = (comm, u, st)

    def run(self) -> None:
        while not self.stop_evt.wait(1.0):
            self._sample()

    def finish(self) -> dict:
        self.stop_evt.set()
        self.join(timeout=5.0)
        self._sample()
        hz = os.sysconf("SC_CLK_TCK")
        agg: dict[str, dict[str, float]] = {}
        for comm, u, s in self.cpu_max.values():
            g = "java" if "java" in comm else (
                "python" if "python" in comm else "other")
            d = agg.setdefault(g, {"utime_s": 0.0, "stime_s": 0.0, "n_procs": 0})
            d["utime_s"] += u / hz
            d["stime_s"] += s / hz
            d["n_procs"] += 1
        return {g: {k: round(v, 1) for k, v in d.items()} for g, d in agg.items()}


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    wal = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_wal_ur1qe_lq"
    n_seg = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    strategy = sys.argv[4] if len(sys.argv) > 4 else "mor"
    evdir = tempfile.mkdtemp(prefix="evlog_")
    env = dict(os.environ, SPARK_DRIVER_MEMORY="32g", PROF_REPO=REPO)
    cmd = [sys.executable, "-c", _WORKER, str(cpus), wal, str(n_seg), strategy, evdir]
    # same pinning knobs as scaling.py so profiles match scaling runs;
    # PROF_JAVA_OPTS appends experiment JVM flags (GC choice, -Xms, ...)
    if os.environ.get("SCALING_PIN", "1") != "0":
        pinned = min(int(os.environ.get("SCALING_PIN_FACTOR", "2")) * cpus,
                     os.cpu_count() or 32)
        cmd = ["taskset", "-c", f"0-{pinned - 1}"] + cmd
        env["SPARK_SUBMIT_OPTS"] = (
            f"-XX:ActiveProcessorCount={pinned} "
            + os.environ.get("PROF_JAVA_OPTS", "")
        ).strip()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, env=env)
    comm_cpu = _CommCpuSampler(proc.pid)
    comm_cpu.start()
    stdout, stderr = proc.communicate()
    split = comm_cpu.finish()
    if proc.returncode != 0:
        sys.stderr.write(stderr[-4000:])
        sys.exit(1)
    print(stdout.strip().splitlines()[-1])
    print(json.dumps({"tree_cpu_by_comm_s": split}))

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
            rec = tasks.setdefault(k, {"run_s": 0.0, "cpu_s": 0.0, "max_s": 0.0,
                                       "gc_s": 0.0, "spill_mb": 0.0,
                                       "sh_write_mb": 0.0, "sh_write_s": 0.0,
                                       "sh_read_mb": 0.0, "input_mb": 0.0,
                                       "ser_s": 0.0, "deser_s": 0.0})
            run = m.get("Executor Run Time", 0) / 1000
            rec["run_s"] += run
            # cpu vs run gap = the task thread BLOCKED (python worker
            # round-trip, shuffle fetch, disk) rather than computing
            rec["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
            rec["max_s"] = max(rec["max_s"], run)
            rec["gc_s"] += m.get("JVM GC Time", 0) / 1000
            rec["ser_s"] += m.get("Result Serialization Time", 0) / 1000
            rec["deser_s"] += m.get("Executor Deserialize Time", 0) / 1000
            rec["spill_mb"] += (m.get("Memory Bytes Spilled", 0)
                                + m.get("Disk Bytes Spilled", 0)) / 1e6
            sw = (m.get("Shuffle Write Metrics") or {})
            rec["sh_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
            rec["sh_write_s"] += sw.get("Shuffle Write Time", 0) / 1e9
            sr = (m.get("Shuffle Read Metrics") or {})
            rec["sh_read_mb"] += (sr.get("Local Bytes Read", 0)
                                  + sr.get("Remote Bytes Read", 0)) / 1e6
            im = (m.get("Input Metrics") or {})
            rec["input_mb"] += im.get("Bytes Read", 0) / 1e6
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
