"""Passive /proc/interrupts sampler: host-wide TLB-shootdown / function-call
IPI / rescheduling-IPI counter deltas, one JSON line per PERIOD seconds.

Near-zero cost (one /proc read per sample), so it runs for the whole session
alongside the quiet-window watcher. Post-hoc, join on `t` against the
attempt windows in hunt_r5*_attempts.jsonl (`t0_epoch_ms` + `sec` per level)
to get IPI rates DURING each scaling level: if TLB shootdowns/sec at
local[8] are orders of magnitude above local[2], that is the measured
kernel-side mechanism behind the java stime blow-up (83s -> 302s for
identical work, hunt_r5e96 attempt 2), since every munmap of a
memory-mapped shuffle block IPIs all cores that might cache the mapping.
"""

from __future__ import annotations

import json
import sys
import time

PERIOD = 15


def counters() -> dict:
    out = {}
    with open("/proc/interrupts") as fh:
        for line in fh:
            key = line.split(":", 1)[0].strip()
            if key in ("TLB", "CAL", "RES"):
                out[key] = sum(int(x) for x in line.split()[1:33])
    return out


def main() -> None:
    path = sys.argv[1]
    while True:
        c = counters()
        c["t"] = int(time.time())
        with open(path, "a") as fh:
            fh.write(json.dumps(c) + "\n")
        time.sleep(PERIOD)


if __name__ == "__main__":
    main()
