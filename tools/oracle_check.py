"""Local mirror of the driver's correctness gate: run every oracle_sql()
query in DuckDB over parquet views and the matching queries() DataFrame in
Spark, compare row multisets exactly.

Usage: python tools/oracle_check.py [sf_dir ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from game_library_enrichment_etl_spark.session import get_spark  # noqa: E402

TABLES = [
    "events", "lineitem", "orders", "customer", "part", "nation", "region",
    "supplier", "documents", "embeddings",
]


def _norm(v):
    from decimal import Decimal

    if isinstance(v, Decimal):
        v = float(v)  # DuckDB's round() yields DECIMAL; values are exact
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus),
                      app_name="oracle-check")
    qs, sqls = E.queries(), E.oracle_sql()
    bad = 0
    for sf in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        for name, fn in qs.items():
            sql = sqls[name]
            try:
                want = sorted(
                    tuple(_norm(v) for v in row) for row in con.execute(sql).fetchall()
                )
                got = sorted(
                    tuple(_norm(v) for v in row)
                    for row in fn(spark, sf).collect()
                )
            except Exception as e:  # noqa: BLE001
                print(f"{sf} {name}: ERROR {e}")
                bad += 1
                continue
            if want == got:
                print(f"{sf} {name}: OK ({len(got)} rows)")
            else:
                bad += 1
                only_w = [r for r in want if r not in got][:3]
                only_g = [r for r in got if r not in want][:3]
                print(f"{sf} {name}: MISMATCH rows {len(want)} vs {len(got)}"
                      f"\n  oracle-only: {only_w}\n  spark-only:  {only_g}")
        con.close()
    print(f"RESULT: {'ALL OK' if bad == 0 else f'{bad} FAILURES'}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
