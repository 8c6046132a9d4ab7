"""Aggregate host memory-bandwidth ceiling vs core count.

Adjudicates the quiet-host non-scaling of t_merge_write (attempt 6 in
BENCH/hunt_r5_attempts.jsonl: 163s -> 162s at 2->8 task slots with
steal/foreign/GC/disk all ~0, while tree CPU-seconds inflated 960 -> 1890).
CPU-second inflation at equal work is the signature of stall cycles; the
prime shared-resource suspect on a single-socket VM is DRAM bandwidth.

Protocol: K pinned worker processes (cores 0..K-1, same pin set the scaling
harness uses) each stream a 256MB numpy copy (far beyond LLC) for DURATION
seconds; we report per-worker and aggregate GB/s for K in CORES. If
aggregate bandwidth saturates near the 4-core point, no memory-intensive
phase can scale 4->16 pinned cores on this host, independent of plan shape.

Usage: python BENCH/membw.py [duration_s] [cores_csv]
Appends one JSON line per K to stdout.
"""
import json
import os
import subprocess
import sys

DUR = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
CORES = [int(c) for c in (sys.argv[2].split(",") if len(sys.argv) > 2
                          else ["1", "2", "4", "8", "16"])]

_W = r"""
import sys, time
import numpy as np
dur = float(sys.argv[1])
a = np.empty(256 << 20, dtype=np.uint8)
b = np.empty(256 << 20, dtype=np.uint8)
a[:] = 7  # fault pages in
b[:] = 3
n = 0
t0 = time.perf_counter()
while time.perf_counter() - t0 < dur:
    b[:] = a
    n += 1
dt = time.perf_counter() - t0
# one copy touches 2*256MB of DRAM traffic (read src + write dst;
# write-allocate makes it ~3x on most uarchs, but we report the
# conventional 2x so numbers compare with STREAM copy)
sys.stdout.write(f"{n * 2 * 256 / 1024 / dt:.3f}\n")
"""


def run(k: int) -> dict:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", _W, str(DUR)],
            stdout=subprocess.PIPE, text=True,
        )
        for i in range(k)
    ]
    per = [float(p.communicate()[0].strip()) for p in procs]
    return {
        "cores": k,
        "per_worker_gbs": [round(x, 2) for x in per],
        "aggregate_gbs": round(sum(per), 2),
    }


if __name__ == "__main__":
    for k in CORES:
        print(json.dumps(run(k)), flush=True)
