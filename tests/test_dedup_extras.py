"""Hot-band capping for MinHash LSH (VERDICT r1 #7) and the fuzzy join's
empty-block fallback (reference parity, VERDICT r1 #3)."""

from __future__ import annotations

import logging

from pyspark.sql import functions as F

from game_library_enrichment_etl_spark.operators.dedup import minhash_lsh_pairs
from game_library_enrichment_etl_spark.operators.similarity import blocked_similarity_join


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_band_cap_drops_hot_bands_and_logs(spark, caplog):
    # 40 identical boilerplate docs: every band bucket holds all 40 ->
    # 780 quadratic pairs without a cap
    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do") for i in range(40)]
    df = _docs(spark, boiler)
    uncapped = minhash_lsh_pairs(df, jaccard_threshold=0.5)
    assert uncapped.count() == 40 * 39 // 2

    stats: dict = {}
    with caplog.at_level(logging.WARNING):
        capped = minhash_lsh_pairs(
            df, jaccard_threshold=0.5, band_cap=10, drop_stats=stats
        )
        n = capped.count()
    assert n == 0  # every bucket was hot; nothing silently survives
    assert stats["hot_bands_dropped"] >= 1
    assert stats["rows_in_dropped_bands"] >= 40
    assert any("band_cap" in r.message for r in caplog.records)


def test_band_cap_no_recall_loss_on_normal_corpus(spark):
    rows = []
    for i in range(30):
        rows.append((2 * i, f"unique document number {i} with words alpha beta gamma delta {i}"))
        # a near-duplicate partner differing by one trailing word
        rows.append((2 * i + 1, f"unique document number {i} with words alpha beta gamma delta {i} tail"))
    df = _docs(spark, rows)
    base = {tuple(r) for r in minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()}
    stats: dict = {}
    capped = {
        tuple(r)
        for r in minhash_lsh_pairs(
            df, jaccard_threshold=0.5, band_cap=25, drop_stats=stats
        ).collect()
    }
    assert stats["hot_bands_dropped"] == 0
    assert base == capped
    assert len(base) >= 20  # the near-dup pairs are actually found


def test_fuzzy_empty_block_fallback(spark):
    left = spark.createDataFrame(
        [(1, "alpha centauri"), (2, "#weird prefixed name")], "id bigint, name string"
    )
    right = spark.createDataFrame(
        [(10, "alpha centuri"), (11, "beta pictoris"), (12, "weird prefixed nam")],
        "id bigint, name string",
    )
    # without fallback: row 2's block '#' has no candidates -> null match
    off = blocked_similarity_join(
        left, right, "id", "name", "id", "name", threshold=10.0,
        fallback_full_scan=False,
    ).collect()
    off_by_key = {r["l_key"]: r for r in off}
    assert off_by_key[2]["match_key"] is None
    assert off_by_key[1]["match_key"] == 10

    # with fallback (reference internet_games_database.py:459-466 behavior):
    # row 2 is scored against the FULL candidate list
    on = blocked_similarity_join(
        left, right, "id", "name", "id", "name", threshold=10.0,
        fallback_full_scan=True,
    ).collect()
    on_by_key = {r["l_key"]: r for r in on}
    assert on_by_key[2]["match_key"] == 12
    assert on_by_key[1]["match_key"] == 10  # blocked rows unaffected
