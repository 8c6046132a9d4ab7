"""Quiet-pair watcher for the two-level scaling evidence (round 5, post-fix).

Runs (lo, hi) pairs of the full CDC apply job until ``target_quiet`` pairs
land where BOTH levels were quiet — host steal <= 2% AND same-VM foreign
CPU <= 2% (the live tree sampler in scaling.py) — then reports the median
quiet efficiency. Appends one JSONL line per attempt to ``--out`` so no
attempt is ever discarded, plus a final ``watcher_summary`` line.

Unlike hunt.py this does NOT write BASELINE.md (the round-5 narrative is
maintained by hand); it only produces the attempt log the narrative cites.

Usage:
  python BENCH/watch_quiet.py [n_events] [n_seg] [lo] [hi] [strategy]
                              [target_quiet] [max_attempts]
Env:
  WATCH_WAL=/path        reuse an existing WAL instead of generating
  WATCH_OUT=file.jsonl   attempts log (default BENCH/hunt_r5b_attempts.jsonl)
  WATCH_ATTEMPT_BASE=N   first attempt number (default 1)
"""

from __future__ import annotations

import fcntl
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import gen_wal, run_level_once  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUIET_STEAL = 2.0
QUIET_OTHER = 2.0


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_seg = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    strategy = sys.argv[5] if len(sys.argv) > 5 else "mor"
    target_quiet = int(sys.argv[6]) if len(sys.argv) > 6 else 3
    max_attempts = int(sys.argv[7]) if len(sys.argv) > 7 else 12
    out_path = os.environ.get(
        "WATCH_OUT", os.path.join(REPO, "BENCH", "hunt_r5b_attempts.jsonl")
    )
    base = int(os.environ.get("WATCH_ATTEMPT_BASE", "1"))

    lock = open(os.path.join(REPO, "BENCH", ".heavy.lock"), "w")
    fcntl.flock(lock, fcntl.LOCK_EX)
    wal = os.environ.get("WATCH_WAL") or gen_wal(n_events, n_seg)
    fcntl.flock(lock, fcntl.LOCK_UN)
    print(f"WAL at {wal}", file=sys.stderr, flush=True)

    quiet_effs: list[float] = []
    for i in range(max_attempts):
        attempt = base + i
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            r_lo = run_level_once(lo, wal, n_seg, strategy)
            r_hi = run_level_once(hi, wal, n_seg, strategy)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
        eff = (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / (hi / lo)
        quiet = all(
            r["host_steal_pct"] <= QUIET_STEAL and r["other_cpu_pct"] <= QUIET_OTHER
            for r in (r_lo, r_hi)
        )
        rec = {
            "attempt": attempt,
            "efficiency": round(eff, 3),
            "quiet": quiet,
            "lo": r_lo,
            "hi": r_hi,
        }
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(
            json.dumps(
                {
                    "attempt": attempt,
                    "efficiency": round(eff, 3),
                    "quiet": quiet,
                    "lo_steal": r_lo["host_steal_pct"],
                    "hi_steal": r_hi["host_steal_pct"],
                    "lo_other": r_lo["other_cpu_pct"],
                    "hi_other": r_hi["other_cpu_pct"],
                }
            ),
            flush=True,
        )
        if quiet:
            quiet_effs.append(eff)
            if len(quiet_effs) >= target_quiet:
                break

    summary = {
        "watcher_summary": {
            "attempts": i + 1,
            "quiet_attempts": len(quiet_effs),
            "quiet_efficiencies": [round(e, 3) for e in sorted(quiet_effs)],
            "median_quiet_efficiency": (
                round(statistics.median(quiet_effs), 3) if quiet_effs else None
            ),
        }
    }
    print(json.dumps(summary), flush=True)
    with open(out_path, "a") as fh:
        fh.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
