"""Opportunistic quiet-window scaling watcher (VERDICT r4 next #2).

The deadline-bounded hunt (BENCH/hunt.py) lost to host noise in rounds 3 and
4 — a contiguous 155-minute block never contained 3 quiet paired attempts.
This watcher inverts the strategy: it runs for the WHOLE session at near-zero
cost, sampling host CPU steal from /proc/stat every SAMPLE_S seconds, and
only when a rolling 2-minute window shows steal <= QUIET_PCT *and* the host
is otherwise idle (1-min loadavg gate, so the builder's own test/bench runs
don't contaminate the measurement) does it fire ONE paired scaling attempt
(local[lo] then local[hi], fresh JVMs, same pre-generated WAL).

Every steal sample is appended to BENCH/steal_log_r5.jsonl and every paired
attempt to BENCH/hunt_r5_attempts.jsonl — so the outcome is provable either
way: >=3 quiet pairs => median efficiency headline in BENCH/BASELINE.md;
zero/few quiet windows => the full-session steal log documents that the host
never offered them.

Mutual exclusion: the builder wraps its own heavy Spark work (pytest, bench)
in `flock BENCH/.heavy.lock <cmd>`; the watcher takes the same lock
non-blocking before firing and holds it for the attempt's duration, so the
two kinds of heavy work never overlap (see memory: concurrent Spark work
contaminates scaling runs by up to 6x).

Usage: python BENCH/watcher.py [max_hours] [n_events] [n_seg] [lo] [hi] [strategy]
"""

from __future__ import annotations

import fcntl
import json
import os
import statistics
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import build_result, gen_wal, run_level_once, write_md  # noqa: E402

BENCH = os.path.dirname(os.path.abspath(__file__))
LOCK_PATH = os.path.join(BENCH, ".heavy.lock")
STEAL_LOG = os.environ.get("WATCH_STEAL_LOG",
                           os.path.join(BENCH, "steal_log_r5.jsonl"))
ATTEMPTS = os.environ.get("WATCH_OUT",
                          os.path.join(BENCH, "hunt_r5_attempts.jsonl"))

SAMPLE_S = 15          # steal sampling cadence
WINDOW_S = 120         # quiet window length the verdict prescribed
QUIET_PCT = 2.0        # per-window and per-run steal threshold
OTHER_CPU_PCT = 6.0    # per-run same-VM foreign-CPU threshold (host-wide %).
# With the live-sampled tree accounting (scaling._TreeCpuSampler) the true
# idle-host foreign floor is <1% of 32 cores (whodunit_r5: claude 0.03
# cores, process_api 0.01); 6% is generous headroom that still catches the
# contention class that produced r5 attempt 1 (6x degradation, which needs
# tens of % foreign CPU). The first r5 protocol snapshotted tree membership
# after worker exit, misattributing the worker's own reparented JVM as
# foreign (~13-15% at local[8]) — no attempt could ever qualify.
LOAD_GATE = 2.0        # 1-min loadavg above this = local work running, don't fire
COOLDOWN_S = 180       # after any attempt, let writeback/caches settle
TARGET_QUIET = int(os.environ.get("WATCH_TARGET_QUIET", "3"))


def _cpu_steal_total() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def _append(path: str, obj: dict) -> None:
    with open(path, "a") as fh:
        fh.write(json.dumps(obj) + "\n")


def main() -> None:
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 5.5
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    n_seg = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    lo = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    hi = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    strategy = sys.argv[6] if len(sys.argv) > 6 else "mor"

    t_end = time.monotonic() + max_hours * 3600
    # Generate the WAL up-front (session start, while the builder is doing
    # text edits) so a later quiet window is spent measuring, not generating.
    # WATCHER_WAL reuses an existing dir (e.g. after a watcher restart).
    wal = os.environ.get("WATCHER_WAL", "")
    if wal and os.path.isdir(wal):
        print(f"reusing WAL at {wal}", flush=True)
    else:
        print("generating WAL...", flush=True)
        wal = gen_wal(n_events, n_seg)
        print(f"WAL ready at {wal}", flush=True)

    window: deque[tuple[float, float]] = deque()  # (monotonic_ts, steal_pct)
    quiet_pairs: list[tuple[float, dict, dict]] = []
    # keeps hunt_r5_attempts.jsonl numbering unambiguous across watcher
    # restarts (e.g. after a harness fix mid-session)
    attempt = int(os.environ.get("WATCHER_ATTEMPT_BASE", "0"))
    s_prev, t_prev = _cpu_steal_total()
    lock_fh = open(LOCK_PATH, "w")

    while time.monotonic() < t_end and len(quiet_pairs) < TARGET_QUIET:
        time.sleep(SAMPLE_S)
        s_now, t_now = _cpu_steal_total()
        steal_pct = 100.0 * (s_now - s_prev) / max(t_now - t_prev, 1)
        s_prev, t_prev = s_now, t_now
        load1 = os.getloadavg()[0]
        now = time.monotonic()
        window.append((now, steal_pct))
        while window and window[0][0] < now - WINDOW_S:
            window.popleft()
        win_max = max(p for _, p in window)
        win_full = len(window) >= WINDOW_S // SAMPLE_S
        _append(STEAL_LOG, {
            "t": round(time.time(), 1), "steal_pct": round(steal_pct, 2),
            "load1": round(load1, 1), "win_max": round(win_max, 2),
            "win_full": win_full,
        })

        if not (win_full and win_max <= QUIET_PCT and load1 <= LOAD_GATE):
            continue
        try:
            fcntl.flock(lock_fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            _append(STEAL_LOG, {"t": round(time.time(), 1), "skip": "lock_held"})
            continue
        try:
            attempt += 1
            _append(STEAL_LOG, {"t": round(time.time(), 1), "fire": attempt})
            r_lo = run_level_once(lo, wal, n_seg, strategy)
            r_hi = run_level_once(hi, wal, n_seg, strategy)
            eff = (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / (hi / lo)
            # quiet = hypervisor steal low at BOTH levels AND same-VM
            # other-process CPU low (r5 attempt 1 was 6x degraded at 4.9%
            # steal — contention steal can't see; other_cpu_pct can)
            quiet = all(r["host_steal_pct"] <= QUIET_PCT
                        and r.get("other_cpu_pct", 0.0) <= OTHER_CPU_PCT
                        for r in (r_lo, r_hi))
            rec = {"attempt": attempt, "efficiency": round(eff, 3),
                   "quiet": quiet, "lo": r_lo, "hi": r_hi}
            _append(ATTEMPTS, rec)
            print(json.dumps({k: rec[k] for k in ("attempt", "efficiency", "quiet")}
                             | {"lo_steal": r_lo["host_steal_pct"],
                                "hi_steal": r_hi["host_steal_pct"],
                                "lo_other": r_lo.get("other_cpu_pct"),
                                "hi_other": r_hi.get("other_cpu_pct")}), flush=True)
            if quiet:
                quiet_pairs.append((eff, r_lo, r_hi))
        finally:
            fcntl.flock(lock_fh, fcntl.LOCK_UN)
        window.clear()  # the attempt itself dirtied the window; re-observe
        # resample the steal counters so the attempt's own CPU time (which is
        # not steal, but hides concurrent steal) doesn't skew the next sample
        time.sleep(COOLDOWN_S)
        s_prev, t_prev = _cpu_steal_total()

    summary = {
        "attempts": attempt,
        "quiet_attempts": len(quiet_pairs),
        "quiet_efficiencies": sorted(round(e, 3) for e, _, _ in quiet_pairs),
    }
    if len(quiet_pairs) >= TARGET_QUIET:
        quiet_pairs.sort(key=lambda t: t[0])
        med_eff, r_lo_m, r_hi_m = quiet_pairs[(len(quiet_pairs) - 1) // 2]
        result = build_result(lo, hi, r_lo_m, r_hi_m, n_events, n_seg, strategy)
        result["quiet_window"] = True
        result["attempts"] = attempt
        result["quiet_attempts"] = len(quiet_pairs)
        result["quiet_efficiencies"] = summary["quiet_efficiencies"]
        result["median_efficiency"] = round(med_eff, 3)
        write_md(lo, hi, r_lo_m, r_hi_m, result, n_events, n_seg, strategy)
        summary["median_efficiency"] = round(med_eff, 3)
        summary["wrote_baseline_md"] = True
    print(json.dumps({"watcher_summary": summary}), flush=True)
    import shutil
    shutil.rmtree(wal, ignore_errors=True)


if __name__ == "__main__":
    main()
