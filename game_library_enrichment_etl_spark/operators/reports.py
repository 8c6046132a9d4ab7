"""Row-level issue / quarantine report tables (reference S10).

The reference writes per-issue CSVs after each enrichment run:
``low_similarity_games.csv`` / ``no_hltb_records.csv``
(/root/reference/src/how_long_to_beat.py:510-538) and
``year_mismatches.csv`` / ``category_analysis.csv``
(/root/reference/src/internet_games_database.py:830-874). The engine's
rendition: pure DataFrame splits of a matched fuzzy-join output into
row-level report tables, plus an append-only parquet report sink under
``<root>/reports/<name>/`` so every batch's issues are queryable as a
table (the lake-native replacement for loose CSVs).

All splits are projections/filters of inputs already computed — zero extra
joins except ``attribute_mismatch_report`` (one join back per side to
fetch the compared attribute), so report cost is O(matches) at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REPORTS_DIRNAME = "reports"


def low_similarity_report(matched: DataFrame, threshold_low: float = 75.0) -> DataFrame:
    """Matched rows whose best score is suspicious (< threshold_low) —
    the reference's low_similarity_games.csv
    (/root/reference/src/how_long_to_beat.py:510-524)."""
    return matched.where(
        F.col("match_key").isNotNull() & (F.col("similarity") < threshold_low)
    )


def unmatched_report(matched: DataFrame) -> DataFrame:
    """Left rows with no match above threshold — the reference's
    no_hltb_records.csv (/root/reference/src/how_long_to_beat.py:526-538)."""
    return matched.where(F.col("match_key").isNull()).select("l_key", "l_txt")


def attribute_mismatch_report(
    matched: DataFrame,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_attr: str,
    right_attr: str,
) -> DataFrame:
    """Matched pairs whose compared attribute disagrees — the reference's
    year_mismatches.csv (/root/reference/src/internet_games_database.py:830-853),
    generalized to any attribute. One broadcast-eligible equi-join per side
    to fetch the attribute; output is row-level (pair + both values)."""
    l = left.select(F.col(left_key).alias("l_key"), F.col(left_attr).alias("l_attr"))
    r = right.select(F.col(right_key).alias("match_key"), F.col(right_attr).alias("r_attr"))
    m = matched.where(F.col("match_key").isNotNull()).select("l_key", "match_key", "similarity")
    joined = m.join(l, "l_key").join(r, "match_key")
    return joined.where(
        ~F.col("l_attr").eqNullSafe(F.col("r_attr"))
    ).select("l_key", "match_key", "similarity", "l_attr", "r_attr")


def category_analysis(df: DataFrame, category_col: str) -> DataFrame:
    """Per-category counts + share — the reference's category_analysis.csv
    (/root/reference/src/internet_games_database.py:855-874). The global
    share is a window over the (tiny) post-aggregation category set, not
    over the input rows."""
    return (
        df.groupBy(category_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "pct", F.round(F.col("n") / F.sum("n").over(Window.partitionBy()), 6)
        )
    )


def write_report(df: DataFrame, root: str, name: str, version: int) -> str:
    """Append one batch's report rows as an immutable parquet file set under
    ``<root>/reports/<name>/v{version}/`` (mirrors the lineage sink)."""
    out = os.path.join(root, REPORTS_DIRNAME, name, f"v{version:08d}")
    df.write.mode("errorifexists").parquet(out)
    return out


def read_report(spark, root: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, REPORTS_DIRNAME, name, "*"))
