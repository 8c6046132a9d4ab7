"""Extra per-query isolation benchmarks (guide §1.4) — NOT the frozen
driver bench. Times each named query through the noop sink in ONE session,
with a warm-up run of the SAME query first when --warm is given, so the
number isolates steady-state computation from first-run JIT/codegen.

Usage:
    python bench_extra.py [--warm] [--reps N] [query ...]

Prints one JSON line: {"queries": {name: [sec, ...]}, "warm": bool}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from game_library_enrichment_etl_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    warm = "--warm" in args
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus),
                      app_name="bench-extra")
    spark.range(1000).count()
    qs = E.queries()
    if not names:
        names = [n for n in qs if n != "cdc_apply_events"]
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name}: warm" if warm else name)
        if warm:
            _force(fn(spark, sf_dir))
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            _force(fn(spark, sf_dir))
            out.setdefault(name, []).append(round(time.monotonic() - t0, 3))
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"queries": out, "warm": warm, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
