"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir;
compare row count, column names/sorted, and exact values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        return [f"ROWCOUNT spark={len(sdf)} duck={len(ddf)}"]
    if sorted(sdf.columns) != sorted(ddf.columns):
        return [f"COLUMNS spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"]
    a, b = canon(sdf), canon(ddf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            af = pd.to_numeric(a[c]).to_numpy(dtype=float)
            bf = pd.to_numeric(b[c]).to_numpy(dtype=float)
            exact = np.array_equal(af, bf, equal_nan=True)
            if not exact:
                close = np.allclose(af, bf, rtol=0, atol=1e-9, equal_nan=True)
                bad = int((~np.isclose(af, bf, rtol=0, atol=1e-9, equal_nan=True)).sum())
                if close:
                    problems.append(f"FLOAT-HASH-RISK col={c} (equal within 1e-9, not bitwise)")
                else:
                    i = int(np.argmax(~np.isclose(af, bf, rtol=0, atol=1e-9, equal_nan=True)))
                    problems.append(f"VALUES col={c} ({bad} diffs; e.g. {af[i]} vs {bf[i]})")
        else:
            eq = (pd.Series(av).astype(object).where(pd.notna(av), None)
                  == pd.Series(bv).astype(object).where(pd.notna(bv), None))
            both_null = pd.Series(av).isna() & pd.Series(bv).isna()
            ok = (eq | both_null).all()
            if not ok:
                i = int(np.argmax(~(eq | both_null).to_numpy()))
                problems.append(f"VALUES col={c} (e.g. {av[i]!r} vs {bv[i]!r})")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from game_library_enrichment_etl_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = E.queries(), E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name:28s} SPARK-ERROR {str(ex).splitlines()[0][:140]}")
            n_fail += 1
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"rows  {name:28s} {len(sdf)} rows (no oracle)")
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as ex:
            print(f"FAIL  {name:28s} DUCK-ERROR {str(ex).splitlines()[0][:140]}")
            n_fail += 1
            continue
        probs = compare(name, sdf, ddf)
        dt = time.monotonic() - t0
        if not probs:
            print(f"PASS  {name:28s} {len(sdf):6d} rows  {dt:5.1f}s")
            n_pass += 1
        else:
            print(f"FAIL  {name:28s} {len(sdf):6d} rows  {dt:5.1f}s  " + " | ".join(probs[:3]))
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
