"""A/B: does keeping local shuffle reads off mmap (and shrinking syscall
counts) recover the hi-level kernel-CPU blow-up?

Evidence motivating this (hunt_r5e96_attempts.jsonl, attempt 2, 96M events):
the entire 2->8 efficiency loss is extra CPU at the hi level (+268
tree-CPU-s / 8 cores ~= the whole 31.5s wall gap), and 80% of that is java
KERNEL time: stime 83s at local[2] -> 302s at local[8] for byte-identical
work (zero spill, zero retries, GC flat). Kernel costs that scale
superlinearly with core count are IPI-class: every munmap of a
memory-mapped shuffle block broadcasts TLB-shootdown IPIs to all cores the
mapping may be cached on — 16 pinned cores pay 4x the IPIs of 4. Spark
memory-maps any local shuffle block over spark.storage.memoryMapThreshold
(default 2m), and our merge-exchange blocks sit right at ~2MB
(441MB / (9 maps x 24 reducers)).

Variants (each a fresh-JVM lo[2]+hi[8] pair on the same 24M WAL, quiet-
gated by the caller running under flock on an idle host):
  base    — engine defaults as measured in hunt_r5e96
  nommap  — spark.storage.memoryMapThreshold=2g (shuffle reads use
            buffered file IO; no mmap, no munmap, no shootdowns)
  nommap_bigbuf — nommap + 1m shuffle write buffers (fewer write()
            syscalls per byte: spark.shuffle.file.buffer and the unsafe
            writer's output buffer, both default 32k)

Per run we record the usual scaling telemetry plus the host-wide
TLB/CAL/RES interrupt deltas (/proc/interrupts) across the run window —
the direct counter for the hypothesized mechanism.

Usage: flock BENCH/.heavy.lock python BENCH/mmap_ab.py [wal_dir] [out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import run_level_once  # noqa: E402
from tlb_sampler import counters  # noqa: E402

BENCH = os.path.dirname(os.path.abspath(__file__))

VARIANTS = {
    "base": {},
    "nommap": {"spark.storage.memoryMapThreshold": "2g"},
    "nommap_bigbuf": {
        "spark.storage.memoryMapThreshold": "2g",
        "spark.shuffle.file.buffer": "1m",
        "spark.shuffle.unsafe.file.output.buffer": "1m",
    },
}


def main() -> None:
    wal = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_wal_pp7klu8c"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        BENCH, "mmap_ab_r5.jsonl")
    n_seg = len([f for f in os.listdir(wal) if f.startswith("seg-")])
    for name, conf in VARIANTS.items():
        os.environ["SCALING_EXTRA_CONF"] = json.dumps(conf)
        rec = {"variant": name, "conf": conf, "wal": wal, "t": int(time.time())}
        for key, cpus in (("lo", 2), ("hi", 8)):
            i0 = counters()
            r = run_level_once(cpus, wal, n_seg, "mor")
            i1 = counters()
            r["ipi_delta"] = {k: i1[k] - i0[k] for k in i0}
            r["ipi_tlb_per_s"] = round((i1["TLB"] - i0["TLB"]) / r["sec"], 0)
            rec[key] = r
        rec["efficiency"] = round(
            (rec["hi"]["events_per_sec"] / rec["lo"]["events_per_sec"]) / 4, 3)
        comm = {k: {c: v["stime_s"] for c, v in rec[k]["tree_cpu_by_comm"].items()
                    if c in ("java", "python")} for k in ("lo", "hi")}
        print(json.dumps({"variant": name, "efficiency": rec["efficiency"],
                          "lo_sec": round(rec["lo"]["sec"], 1),
                          "hi_sec": round(rec["hi"]["sec"], 1),
                          "stime": comm,
                          "lo_tlb_s": rec["lo"]["ipi_tlb_per_s"],
                          "hi_tlb_s": rec["hi"]["ipi_tlb_per_s"]}), flush=True)
        with open(out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    os.environ.pop("SCALING_EXTRA_CONF", None)


if __name__ == "__main__":
    main()
