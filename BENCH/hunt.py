"""Quiet-window hunt for the two-level scaling measurement.

The sandbox is a shared host with bursty CPU steal (sampled 0-38% across a
single evening); a steal burst during the higher-parallelism level
understates scaling by design (8 runnable threads lose ~4x more cycles
than 2). This driver re-measures the (lo, hi) pair repeatedly until both
levels of one pair land in a quiet window (per-run steal <= threshold), or
a deadline passes; it keeps the best-efficiency QUIET pair and writes
BENCH/BASELINE.md exactly like scaling.py. Every attempt is logged to
stdout as JSONL — nothing is discarded silently.

Usage: python BENCH/hunt.py [deadline_min] [n_events] [n_seg] [lo] [hi] [strategy]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import build_result, gen_wal, run_level_once, write_md  # noqa: E402


def main():
    deadline_min = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    n_seg = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    lo = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    hi = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    strategy = sys.argv[6] if len(sys.argv) > 6 else "mor"
    quiet_pct = 2.0

    # r3 verdict: one clean pair out of 8 is provisional evidence, not a met
    # criterion — the headline must be the MEDIAN of >=target_quiet paired
    # attempts where BOTH levels ran quiet.
    target_quiet = int(os.environ.get("HUNT_TARGET_QUIET", "3"))

    wal = gen_wal(n_events, n_seg)
    t_end = time.monotonic() + deadline_min * 60
    quiet_pairs: list[tuple[float, dict, dict]] = []
    best_calm = None  # lowest max-steal pair (the most trustworthy non-quiet)
    attempt = 0
    while time.monotonic() < t_end:
        attempt += 1
        r_lo = run_level_once(lo, wal, n_seg, strategy)
        r_hi = run_level_once(hi, wal, n_seg, strategy)
        eff = (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / (hi / lo)
        quiet = (
            r_lo["host_steal_pct"] <= quiet_pct and r_hi["host_steal_pct"] <= quiet_pct
        )
        print(json.dumps({
            "attempt": attempt, "efficiency": round(eff, 3), "quiet": quiet,
            "lo_eps": round(r_lo["events_per_sec"]), "hi_eps": round(r_hi["events_per_sec"]),
            "lo_steal": r_lo["host_steal_pct"], "hi_steal": r_hi["host_steal_pct"],
        }), flush=True)
        # full per-level details so BASELINE.md can be reconstructed from
        # ANY logged attempt, not only the final chosen one
        print(json.dumps({"attempt_detail": attempt, "lo": r_lo, "hi": r_hi}), flush=True)
        # selection: a steal-crushed lo level produces a nonsense
        # super-linear "efficiency", so best-by-efficiency is wrong for
        # non-quiet pairs. Prefer quiet pairs (by efficiency); otherwise
        # keep the pair whose WORSE level saw the least steal — the most
        # trustworthy measurement, whatever its efficiency says.
        steal = max(r_lo["host_steal_pct"], r_hi["host_steal_pct"])
        if best_calm is None or steal < best_calm[0]:
            best_calm = (steal, eff, r_lo, r_hi)
        if quiet:
            quiet_pairs.append((eff, r_lo, r_hi))
            if len(quiet_pairs) >= target_quiet:
                break  # enough quiet pairs for a median; stop

    if quiet_pairs:
        # headline = the MEDIAN quiet pair (lower median for even counts —
        # conservative), with every quiet efficiency reported alongside
        quiet_pairs.sort(key=lambda t: t[0])
        med_eff, r_lo, r_hi = quiet_pairs[(len(quiet_pairs) - 1) // 2]
    else:
        _, _, r_lo, r_hi = best_calm
    result = build_result(lo, hi, r_lo, r_hi, n_events, n_seg, strategy)
    result["quiet_window"] = bool(quiet_pairs)
    result["attempts"] = attempt
    result["quiet_attempts"] = len(quiet_pairs)
    result["quiet_efficiencies"] = [round(e, 3) for e, _, _ in quiet_pairs]
    if quiet_pairs:
        result["median_efficiency"] = round(med_eff, 3)
    print(json.dumps(result), flush=True)
    write_md(lo, hi, r_lo, r_hi, result, n_events, n_seg, strategy)


if __name__ == "__main__":
    main()
