"""Identify which processes burn CPU during scaling attempts.

hunt_r5 attempts at 0% hypervisor steal still record other_cpu_pct of
13-15% during the hi (local[8]) level — ~6.8 cores of same-VM CPU from
processes OUTSIDE the worker tree, with high run-to-run wall variance
(51.5s vs 76.6s for identical input). This sampler polls /proc every
POLL_S seconds and logs the top CPU-delta processes (pid, comm, cores)
so the contention source is identified instead of guessed.

Usage: python BENCH/whodunit.py [minutes] >> BENCH/whodunit_r5.jsonl
"""
from __future__ import annotations

import json
import os
import sys
import time

POLL_S = 5.0
TOP_N = 8
CLK = os.sysconf("SC_CLK_TCK")


def snap() -> dict[int, tuple[str, int]]:
    out: dict[int, tuple[str, int]] = {}
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
        out[int(pid)] = (comm, int(rest[11]) + int(rest[12]))
    return out


def main() -> None:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    t_end = time.monotonic() + minutes * 60
    prev = snap()
    t_prev = time.monotonic()
    while time.monotonic() < t_end:
        time.sleep(POLL_S)
        cur = snap()
        t_now = time.monotonic()
        dt = t_now - t_prev
        deltas = []
        for pid, (comm, cpu) in cur.items():
            d = cpu - prev.get(pid, ("", 0))[1]
            if d > 0:
                deltas.append((d / CLK / dt, pid, comm))
        deltas.sort(reverse=True)
        busy = sum(d for d, _, _ in deltas)
        if busy >= 0.3:  # only log non-idle windows; keep the artifact small
            print(json.dumps({
                "t": round(time.time(), 1),
                "busy_cores": round(busy, 2),
                "top": [{"cores": round(d, 2), "pid": p, "comm": c}
                        for d, p, c in deltas[:TOP_N]],
            }), flush=True)
        prev, t_prev = cur, t_now


if __name__ == "__main__":
    main()
