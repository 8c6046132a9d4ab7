"""Aggregate host memory-bandwidth ceiling probe (VERDICT r4 next #3 class).

The 96M 2->8 scaling pairs lose efficiency entirely to EXTRA CPU burned at
the hi level (hunt_r5e96: tree CPU 2190s -> 2459s for identical work, java
utime +25%, zero spill / zero retries / GC flat) — the classic signature of
per-core memory-bandwidth shrinking as more cores stream concurrently
(higher CPI, same instructions). This probe measures that directly: N
processes, each pinned to its own core, each spinning the SAME 32MB memcpy
the in-run host-speed probe uses (scaling.py _PROBE_SRC, identical 4x-bytes
accounting), reporting per-process and aggregate GB/s for N = 1,2,4,8,16.

If aggregate GB/s saturates well below N x single-stream GB/s, the host has
a shared-DRAM ceiling: a single-box local[2] -> local[8] pair UNDER-estimates
real N -> 4N cluster scaling, because four separate executor hosts bring 4x
memory controllers while one box shares one. The artifact quantifies how
much per-core bandwidth each scaling level actually had.

Usage: flock BENCH/.heavy.lock python BENCH/membw.py [out.jsonl]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WORKER_SRC = r"""
import sys, time
import numpy as np
src = np.ones(32 * 1024 * 1024, dtype=np.uint8)
dst = np.empty_like(src)
end = time.monotonic() + float(sys.argv[1])
spins = 0
t0 = time.monotonic()
while time.monotonic() < end:
    np.copyto(dst, src)
    spins += 1
dt = time.monotonic() - t0
# same accounting as scaling.py _stop_probe: 4 x 32MB per spin
print((4 * 32 / 1024) * spins / dt)
"""


def run_level(n: int, secs: float = 4.0) -> dict:
    procs = []
    for i in range(n):
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORKER_SRC,
             str(secs)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True))
    per = []
    for p in procs:
        out, _ = p.communicate(timeout=secs + 30)
        try:
            per.append(float(out.strip()))
        except ValueError:
            pass
    per.sort()
    agg = sum(per)
    return {
        "n_streams": n,
        "aggregate_gbs": round(agg, 2),
        "per_stream_min_gbs": round(per[0], 2) if per else None,
        "per_stream_med_gbs": round(per[len(per) // 2], 2) if per else None,
        "per_stream_max_gbs": round(per[-1], 2) if per else None,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "membw_r5.jsonl")
    results = []
    for n in (1, 2, 4, 8, 16):
        r = run_level(n)
        r["t"] = round(time.time(), 1)
        results.append(r)
        print(json.dumps(r), flush=True)
        time.sleep(1)
    one = results[0]["aggregate_gbs"]
    summary = {
        "summary": True,
        "single_stream_gbs": one,
        "scaling_vs_linear": {
            str(r["n_streams"]): round(r["aggregate_gbs"] / (one * r["n_streams"]), 3)
            for r in results
        },
    }
    results.append(summary)
    print(json.dumps(summary), flush=True)
    with open(out_path, "a") as fh:
        for r in results:
            fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
