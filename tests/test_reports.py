"""Row-level issue/quarantine report tables (reference S10 parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from game_library_enrichment_etl_spark.operators.reports import (
    attribute_mismatch_report,
    category_analysis,
    low_similarity_report,
    read_report,
    unmatched_report,
    write_report,
)
from game_library_enrichment_etl_spark.operators.similarity import blocked_similarity_join


def _matched(spark):
    left = spark.createDataFrame(
        [(1, "alpha centauri"), (2, "beta pictoris"), (3, "zzz unmatched thing")],
        "id bigint, name string",
    )
    right = spark.createDataFrame(
        [(10, "alpha centuri"), (11, "beta pictoris b"), (12, "alpha century prime")],
        "id bigint, name string",
    )
    return blocked_similarity_join(
        left, right, "id", "name", "id", "name", threshold=55.0,
        fallback_full_scan=False,
    )


def test_report_splits_partition_matches(spark):
    m = _matched(spark)
    rows = {r["l_key"]: r for r in m.collect()}
    assert rows[1]["match_key"] is not None
    assert rows[3]["match_key"] is None

    low = low_similarity_report(m, threshold_low=97.0).collect()
    assert all(r["similarity"] < 97.0 and r["match_key"] is not None for r in low)
    un = unmatched_report(m).collect()
    assert [r["l_key"] for r in un] == [3]
    # every matched row lands in exactly one of {ok, low}; unmatched separate
    n_matched = sum(1 for r in rows.values() if r["match_key"] is not None)
    n_low = len(low)
    assert n_low <= n_matched


def test_attribute_mismatch_report(spark):
    m = _matched(spark)
    left = spark.createDataFrame(
        [(1, 1999), (2, 2005), (3, 2010)], "id bigint, year int"
    )
    right = spark.createDataFrame(
        [(10, 1999), (11, 2006), (12, 2001)], "id bigint, year int"
    )
    out = attribute_mismatch_report(m, left, right, "id", "id", "year", "year")
    got = {(r["l_key"], r["match_key"]): (r["l_attr"], r["r_attr"]) for r in out.collect()}
    # l_key=1 matches r=10 (same year 1999) -> NOT reported
    assert (1, 10) not in got
    # l_key=2 matches r=11 (2005 vs 2006) -> reported
    assert got.get((2, 11)) == (2005, 2006)


def test_category_analysis_shares_sum_to_one(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(30)], "id bigint, cat string"
    )
    rows = category_analysis(df, "cat").collect()
    assert abs(sum(r["pct"] for r in rows) - 1.0) < 1e-6
    assert {r["cat"]: r["n"] for r in rows} == {"a": 20, "b": 10}


def test_write_read_report_roundtrip(spark, tmp_path):
    m = _matched(spark)
    root = str(tmp_path / "tbl")
    write_report(low_similarity_report(m, 97.0), root, "low_similarity", 1)
    write_report(unmatched_report(m), root, "unmatched", 1)
    back = read_report(spark, root, "unmatched")
    assert back.count() == 1
    assert back.collect()[0]["l_key"] == 3
