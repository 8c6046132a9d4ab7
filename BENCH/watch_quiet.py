"""Quiet-pair watcher for the two-level scaling evidence (round 5, post-fix).

Runs (lo, hi) pairs of the full CDC apply job until ``target_quiet`` pairs
land where BOTH levels were quiet — host steal <= 2% AND same-VM foreign
CPU <= 2% (the live tree sampler in scaling.py) — then reports the median
quiet efficiency. Appends one JSONL line per attempt to ``--out`` so no
attempt is ever discarded, plus a final ``watcher_summary`` line.

Host-epoch gate (r5f): steal + foreign-CPU gates cannot see slow-host
epochs — hunt_r5f attempt 1 measured 0.433 at 0.1-0.5% steal / 0% foreign,
with BOTH levels 1.5-3x over their healthy CPU and java kernel time at
719 s, while the pinned-core speed probe ran 10-15% below its healthy band
(probe_alu 4.8-5.0 Mops vs 5.3-5.9 across every clean run in
mmap_ab_r5.jsonl). Two additions: (a) a cheap pre-flight probe (~8 s,
single pinned core) defers firing while the epoch is bad, and (b) the
in-run probe medians gate the attempt post-hoc — an attempt counts as
``quiet`` only when both levels also ran at probe_alu >= EPOCH_ALU_MOPS.
The raw record keeps steal/foreign/probe separately so the log proves
which gate rejected what.

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
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import _PROBE_SRC, gen_wal, run_level_once  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUIET_STEAL = 2.0
QUIET_OTHER = 2.0
# healthy band from every clean run in mmap_ab_r5.jsonl / hunt_r5b:
# probe_alu 5.3-5.9 Mops; degraded epochs measured 4.8-5.0
EPOCH_ALU_MOPS = float(os.environ.get("WATCH_EPOCH_ALU", "5.2"))
# fire threshold is slightly looser than the in-run gate: idle-host
# preflight bursts read a little below in-run probe medians (no calibration
# data for healthy-epoch idle reads), so firing early and letting the
# in-run gate judge beats never firing
PREFLIGHT_ALU_MOPS = float(os.environ.get("WATCH_PREFLIGHT_ALU", "5.05"))
PREFLIGHT_WAIT_S = 60.0
PREFLIGHT_CAP_S = float(os.environ.get("WATCH_PREFLIGHT_CAP_S", str(90 * 60)))


def _preflight_alu(sample_s: float = 8.0) -> float:
    """Median ALU Mops of a short pinned-core probe burst (epoch pre-check).

    ADVICE r5: on a host without ``taskset`` (or with a probe that emits
    nothing) this used to crash or return 0.0 — which the caller reads as
    a degraded epoch and defers for the full preflight cap. Now falls
    back to an unpinned probe, and a probe that still yields no samples
    returns +inf (gate-bypassed, logged) instead of 0.0 (gate-failed)."""
    core = (os.cpu_count() or 32) - 1
    cmds = (
        ["taskset", "-c", str(core), sys.executable, "-u", "-c", _PROBE_SRC],
        [sys.executable, "-u", "-c", _PROBE_SRC],  # fallback: unpinned
    )
    out = ""
    for cmd in cmds:
        try:
            p = subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True
            )
        except OSError:
            continue  # taskset missing: try the unpinned fallback
        time.sleep(sample_s)
        p.terminate()
        out, _ = p.communicate(timeout=10)
        if cmd[0] != "taskset":
            print("watch_quiet: taskset unavailable, probe ran unpinned",
                  flush=True)
        break
    vals = []
    for line in out.splitlines():
        try:
            c, _m = line.split()
            vals.append(2.0 / float(c))
        except (ValueError, ZeroDivisionError):
            continue
    vals.sort()
    if not vals:
        print("watch_quiet: epoch probe yielded no samples; "
              "bypassing the preflight gate", flush=True)
        return float("inf")
    return vals[len(vals) // 2]


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
        # epoch pre-flight: don't burn a 5-minute attempt inside a slow-host
        # epoch the in-run probe would reject anyway
        waited = 0.0
        while True:
            pre = _preflight_alu()
            if pre >= PREFLIGHT_ALU_MOPS or waited >= PREFLIGHT_CAP_S:
                break
            print(json.dumps({"preflight_alu_mops": round(pre, 2),
                              "waiting_s": PREFLIGHT_WAIT_S}), flush=True)
            time.sleep(PREFLIGHT_WAIT_S)
            waited += PREFLIGHT_WAIT_S
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            r_lo = run_level_once(lo, wal, n_seg, strategy)
            r_hi = run_level_once(hi, wal, n_seg, strategy)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
        eff = (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / (hi / lo)
        contention_quiet = all(
            r["host_steal_pct"] <= QUIET_STEAL and r["other_cpu_pct"] <= QUIET_OTHER
            for r in (r_lo, r_hi)
        )
        epoch_ok = all(
            (r.get("probe_alu_mops") or 0.0) >= EPOCH_ALU_MOPS
            for r in (r_lo, r_hi)
        )
        quiet = contention_quiet and epoch_ok
        rec = {
            "attempt": attempt,
            "efficiency": round(eff, 3),
            "quiet": quiet,
            "contention_quiet": contention_quiet,
            "epoch_ok": epoch_ok,
            "preflight_alu_mops": round(pre, 2),
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
                    "epoch_ok": epoch_ok,
                    "lo_steal": r_lo["host_steal_pct"],
                    "hi_steal": r_hi["host_steal_pct"],
                    "lo_other": r_lo["other_cpu_pct"],
                    "hi_other": r_hi["other_cpu_pct"],
                    "lo_alu": r_lo.get("probe_alu_mops"),
                    "hi_alu": r_hi.get("probe_alu_mops"),
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
