"""The reference's relational operator surface, re-expressed as reusable
Catalyst builders (SURVEY.md §2.2-2.8). Each cites its reference precursor.

Everything here is pure DataFrame API -> whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# A1 — grouped max as filter (/root/reference/src/how_long_to_beat.py:200-205,365-370)
def grouped_max_filter(df: DataFrame, group: str, value: str) -> DataFrame:
    w = Window.partitionBy(group)
    return (
        df.withColumn("_gmax", F.max(value).over(w))
        .where(F.col(value) == F.col("_gmax"))
        .drop("_gmax")
    )


# A2/A3 — deterministic best-row per group by a composite ranking
# (/root/reference/src/how_long_to_beat.py:299-339;
#  /root/reference/src/internet_games_database.py:567-617)
def best_row_per_group(df: DataFrame, group: str, order_by: list[Column]) -> DataFrame:
    w = Window.partitionBy(group).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# M1 — keyed upsert: src rows replace same-key tgt rows, others kept
# (/root/reference/src/how_long_to_beat.py:236-244)
def upsert_by_key(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    survivors = target.join(source.select(key).distinct(), key, "left_anti")
    return survivors.unionByName(source)


# M3 — insert-only-new: src keys not in tgt appended (the reference's
# version has a latent dup bug at internet_games_database.py:355-358 —
# it computes df_insert then concats the full frame; we do it right)
def insert_only_new(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    new_rows = source.join(target.select(key).distinct(), key, "left_anti")
    return target.unionByName(new_rows)


# J5-J8 — the reference's four set-difference idioms are all anti-joins
def unmatched(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    return left.join(right.select(key).distinct(), key, "left_anti")


# A9 — value_counts with percentages
# (/root/reference/src/internet_games_database.py:864-884)
def value_counts_pct(df: DataFrame, col: str) -> DataFrame:
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    return counts.select(
        col,
        "n",
        F.round(F.col("n").cast("double") * 100.0 / F.sum("n").over(total), 6).alias("pct"),
    )


# A11 — single-row summary metrics
# (/root/reference/src/how_long_to_beat.py:543-557)
def summary_metrics(df: DataFrame, flag: Column, name: str = "flagged") -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(flag.cast("bigint")).alias(name),
        F.round(F.sum(flag.cast("bigint")).cast("double") / F.count(F.lit(1)), 6).alias(
            f"{name}_rate"
        ),
    )


# P13 — per-row null count across columns (completeness rank,
# /root/reference/src/internet_games_database.py:610-615)
def null_count(cols: list[str]) -> Column:
    out = F.lit(0)
    for c in cols:
        out = out + F.col(c).isNull().cast("int")
    return out.cast("int")


# P12 — dict-lookup CASE (15-entry category map,
# /root/reference/src/internet_games_database.py:903-937)
def map_lookup(col: Column, mapping: dict, default=None) -> Column:
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    return F.coalesce(m[col], F.lit(default))


# E1 — stringified-array decode -> explode -> bridge table
# (/root/reference/src/internet_games_database.py:656-679)
def bridge_explode(
    df: DataFrame, id_col: str, array_json_col: str, out_name: str
) -> DataFrame:
    arr = F.from_json(F.col(array_json_col), "array<bigint>")
    return (
        df.select(F.col(id_col), F.explode(arr).alias(out_name))
        .where(F.col(out_name).isNotNull())
        .dropDuplicates([id_col, out_name])
    )


# Recency re-extraction scope (/root/reference/src/how_long_to_beat.py:59-62):
# keys whose latest event time falls inside a trailing window are
# re-qualified for enrichment even though already processed — distinct from
# lateness (which drops), this WIDENS the work scope. The as-of anchor
# defaults to the data's own max timestamp (deterministic: no wall clock).
def recency_rescope(
    df: DataFrame,
    key: str,
    ts_col: str,
    window_s: int,
    as_of=None,
) -> DataFrame:
    """One row per key whose max(ts) >= as_of - window_s:
    (key, latest_ts). Scale shape: one map-side-combinable groupBy for the
    per-key max, one scalar-aggregate broadcast for the anchor — no window
    function, no second scan of payload columns."""
    latest = df.groupBy(key).agg(F.max(ts_col).alias("latest_ts"))
    if as_of is None:
        anchor = df.agg(F.max(ts_col).alias("_as_of"))
        latest = latest.join(F.broadcast(anchor))
    else:
        latest = latest.withColumn("_as_of", F.lit(as_of).cast("timestamp"))
    return (
        latest.where(
            F.col("latest_ts")
            >= F.col("_as_of") - F.make_interval(secs=F.lit(window_s))
        )
        .select(key, "latest_ts")
    )
