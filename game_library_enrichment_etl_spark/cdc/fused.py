"""Fused single-shuffle MOR apply: one payload exchange per batch.

Round-2/3 profiling (BENCH/profile_apply.py, BENCH/decompose.py) showed the
merge-write phase of the MOR apply was the scaling bottleneck, and that its
cost was structural: the skinny-join path scanned the segment twice more
and moved every payload byte through TWO exchanges (the SHUFFLE_HASH fetch
join on key, then the bucket repartition before the write). This module
replaces that with the minimal data movement the semantics allow:

    window over exact-routed partitioning of (_bucket[, _salt]) groups
    (lake/table.route_expr)                          -- the ONLY exchange
      -> partition-local sort (_bucket, key ASC, version DESC)
      -> lag(key)-based "first row of key group" filter  == LWW winner
      -> delete tombstoning + winners-only html->text Arrow UDF
      -> parquet write partitionBy(_bucket), concurrent writers (no sort)

Correctness hinges on one invariant: ``_bucket = pmod(xxhash64(key),
n_buckets)`` (and the optional in-bucket ``_salt``) is a pure function of
the key, so hash-partitioning on it colocates every row of a key in
exactly one partition, where the window sort makes the key's rows
contiguous with the max-(warc_ts, lsn) row first. Catalyst accepts the
bucket partitioning as the window's required clustering, so NO second
exchange is planned — winner selection, tombstoning, extraction and the
file write all run inside the single post-shuffle stage (one sort, no
Python transfer of loser rows: ``lag`` runs JVM-side and the pandas UDF
sees winner rows only).

Scale properties (the 100-TB design):
- one exchange of payload bytes per batch (was two + an extra scan);
- extraction (the only Python work) runs on winner rows only;
- write parallelism is NOT capped at n_buckets: when the cluster has more
  slots than buckets, an in-bucket salt (also a pure key function) splits
  each bucket across ceil(nparts / n_buckets) writers, producing that many
  delta files per bucket per commit — the MOR manifest supports any
  files-per-bucket count, and resolution order (version, sequence) is
  unaffected because a key never spans two salt shards;
- the writer runs with spark.sql.maxConcurrentOutputFileWriters set so the
  planner does NOT re-sort the extracted output by partition column
  (verified: plan has no Sort node; rows arrive bucket-clustered anyway).

Contract: ``lsn`` is a unique sequence number (the WAL/LSN contract).
Duplicates are adjacent after the sort, so each row checks its successor
via ``lead``; a partition-wide ``max`` over the same window folds every
row's flag — winning AND non-winning duplicates — into the winners'
tombstone column, which raises pre-commit (``raise_error``) on the first
batch that delivers any duplicated (key, warc_ts, lsn).

Reference precursor: newest-extract-wins per key
(/root/reference/src/how_long_to_beat.py:287-296) — re-expressed as a
partition-local vectorized scan instead of a per-row Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extract import extract_text_udf
from ..lake.table import (
    BUCKET_COL,
    DELETED_COL,
    bucket_expr,
    layout_exprs,
    sort_layout,
)


# Column-expression memo (r6, guide §1.2 "per-task work" applied to the
# DRIVER): building this plan costs ~150-200ms of py4j round trips per
# call (~80 Column constructions: window functions over explicit specs,
# per-field casts, the route-token array), and every micro-batch of a
# steady stream rebuilds byte-identical expressions — only the source
# DataFrame differs. Columns are unresolved expression trees (no bound
# attribute ids), so one built set applies to any DataFrame with the
# right column names; cache them per (gateway app, shape) and reuse.
# Keyed on the JVM application id so a restarted SparkContext in the
# same Python process never sees stale py4j handles.
_EXPR_CACHE: dict[tuple, dict] = {}


def _fused_exprs(
    app_id: str,
    key: str,
    op_col: str,
    order_cols: tuple[str, ...],
    cur_schema: T.StructType,
    computed_t: tuple[tuple[str, str], ...],
    n_buckets: int,
    n_parts: int,
    n_salts: int,
) -> dict:
    ck = (
        app_id, key, op_col, order_cols, cur_schema.json(), computed_t,
        n_buckets, n_parts, n_salts,
    )
    hit = _EXPR_CACHE.get(ck)
    if hit is not None:
        return hit
    computed = dict(computed_t)
    _, part_exprs = layout_exprs(key, n_parts, n_salts)
    # materialize the partition keys once: BOTH window passes below must
    # partition by the SAME attributes — re-instantiating the route/salt
    # expressions per window gives them fresh expression IDs and the
    # planner would insert a second full Sort (the one-sort contract the
    # plan-shape test pins)
    pw = [f"_pw{i}" for i in range(len(part_exprs))]
    w = Window.partitionBy(*[F.col(a) for a in pw]).orderBy(
        F.col(key).asc(), *[F.col(c).desc() for c in order_cols]
    )

    # winner = first row of its (contiguous, sorted-desc) key group.
    # row_number()==1 guards the partition's very first row (lag is NULL
    # there, which eqNullSafe would mis-read for a NULL key).
    prev_key = F.lag(F.col(key)).over(w)
    is_first = (F.row_number().over(w) == 1) | (~prev_key.eqNullSafe(F.col(key)))

    # WAL-integrity: a winner whose successor carries the SAME (key,
    # version) means duplicate lsn delivery with potentially divergent
    # payloads. lead(lit(1)) is NULL only past the partition end, so the
    # last row can't false-positive on all-NULL comparisons.
    dup = F.lead(F.lit(1)).over(w).isNotNull()
    for c in (key, *order_cols):
        dup = dup & F.lead(F.col(c)).over(w).eqNullSafe(F.col(c))

    # Partition-wide dup flag (VERDICT r5 "what's wrong" #1): _dup marks a
    # row whose SUCCESSOR repeats its (key, version) — true for winning
    # and non-winning duplicates alike — but winners only evaluate their
    # own row's flag, so a duplicated NON-winning version used to pass the
    # fast path silently. max(_dup) over the whole partition (same
    # partition spec, unbounded frame — a second window pass over the
    # already-clustered rows, NO new exchange or sort) folds every row's
    # flag into the winner's guard.
    w_all = Window.partitionBy(*[F.col(a) for a in pw]).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    is_del = F.col(op_col) == "D"
    # the integrity raise is folded into the tombstone column so every
    # written row evaluates it (a dropped helper column would be pruned)
    guarded_del = F.when(
        F.col("_dup_any") > 0,
        F.raise_error(
            F.lit(
                "WAL integrity violation: duplicate (key, "
                f"{', '.join(order_cols)}) delivered within one batch; "
                "lsn must be a unique sequence number"
            )
        ).cast("boolean"),
    ).otherwise(is_del)

    out_cols = []
    for f in cur_schema.fields:
        if f.name == DELETED_COL:
            out_cols.append(guarded_del.alias(f.name))
        elif f.name in computed:
            src_col = computed[f.name]
            out_cols.append(
                F.when(~is_del, extract_text_udf(F.col(src_col)))
                .cast(f.dataType)
                .alias(f.name)
            )
        elif f.name in (key, *order_cols):
            out_cols.append(F.col(f.name))
        else:
            out_cols.append(
                F.when(is_del, F.lit(None).cast(f.dataType))
                .otherwise(F.col(f.name))
                .alias(f.name)
            )
    out_cols.append(F.col(BUCKET_COL))

    built = {
        "bucket": bucket_expr(key, n_buckets),
        "pw_aliased": [e.alias(a) for e, a in zip(part_exprs, pw)],
        "pw0": F.col(pw[0]),
        "first_dup": [is_first.alias("_first"), dup.alias("_dup")],
        "dup_any": F.max(F.col("_dup").cast("int")).over(w_all).alias("_dup_any"),
        "out_cols": out_cols,
    }
    _EXPR_CACHE[ck] = built
    return built


def fused_cow_merge(
    target: DataFrame,
    batch: DataFrame,
    key: str,
    op_col: str,
    order_cols: tuple[str, ...],
    cur_schema: T.StructType,
    computed: dict[str, str],
    n_buckets: int,
    total_rows: int | None = None,
) -> DataFrame:
    """COW MERGE as union + one route exchange + partition-local LWW
    (r6; the copy-on-write twin of ``fused_mor_winners``).

    The join formulation (cdc/apply._merge) moved the touched payload
    bytes through THREE exchanges: the batch LWW dedup, the full-outer
    join on key, and the bucket-route repartition before the write. But
    the merge decision per key — "batch winner replaces the target row
    iff its (warc_ts, lsn) is >= the target's; op='D' tombstones;
    otherwise the target row carries forward" — is exactly an LWW fold
    over the UNION of target rows and batch rows with a source-wins tie
    break. So: tag target rows pref=0 / batch rows pref=1, union (no
    shuffle), route-repartition once, sort partition-locally by (key ASC,
    version DESC, pref DESC), keep each key's first row. Equivalence with
    the join formulation, case by case for a key's first-sorted row:

    - batch row first and batch version > target's (or no target row):
      take_src was true — same row wins; tombstoning below matches the
      join path's delete CASEs.
    - version tie: pref DESC puts the batch row first; take_src used
      ``>=`` — same winner.
    - target row first (its version is higher): take_src was false — the
      target row carries forward verbatim, including an existing
      tombstone (its op is re-derived as 'D' from the stored flag, so
      the projection reproduces ``coalesce(t._deleted, false)``).
    - batch rows never deduped up front: the sort orders a key's batch
      rows version-DESC, so the first is the batch LWW winner — the
      separate pre-merge dedup exchange is gone. Duplicate (key,
      version) delivery raised in the exact stats pass BEFORE this runs
      (unchanged), so winner ties within the batch cannot occur.

    Extraction (the only Python work) runs AFTER the winner filter and
    receives NULL html for target-won and delete rows — target text is
    passed through, never re-extracted, so per-batch Python cost stays
    O(batch winners), never O(touched buckets).

    ``target`` must be the bucket-pruned read with tombstones included,
    projected to ``cur_schema`` (computed columns present); ``batch`` is
    the normalized projection (op + payload columns, computed absent).
    Output is bucket-clustered and key-sorted within buckets, ready for
    ``write_data_files_prepartitioned`` — same file layout, key bounds
    and per-commit file count as the join path's sorted write."""
    spark = target.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_parts, n_salts = sort_layout(nparts, n_buckets, total_rows)
    x = _cow_exprs(
        spark.sparkContext.applicationId, key, op_col, order_cols,
        cur_schema, tuple(sorted(computed.items())), n_buckets, n_parts,
        n_salts,
    )
    t_side = target.select(*x["t_side"])
    b_side = batch.select(*x["b_side"])
    src = t_side.unionByName(b_side)
    src = src.select(F.col("*"), *x["pw_aliased"])
    src = src.repartition(n_parts, x["pw0"])
    sel = src.select(F.col("*"), x["first"])
    winners = sel.where(F.col("_first"))
    return winners.select(*x["out_cols"])


def _cow_exprs(
    app_id: str,
    key: str,
    op_col: str,
    order_cols: tuple[str, ...],
    cur_schema: T.StructType,
    computed_t: tuple[tuple[str, str], ...],
    n_buckets: int,
    n_parts: int,
    n_salts: int,
) -> dict:
    ck = (
        "cow", app_id, key, op_col, order_cols, cur_schema.json(),
        computed_t, n_buckets, n_parts, n_salts,
    )
    hit = _EXPR_CACHE.get(ck)
    if hit is not None:
        return hit
    computed = dict(computed_t)
    types = {f.name: f.dataType for f in cur_schema.fields}
    payload = [
        f.name for f in cur_schema.fields
        if f.name not in computed and f.name != DELETED_COL
    ]
    # target rows re-derive op from the stored tombstone flag so the
    # shared winner projection reproduces them verbatim; batch rows carry
    # their op and NULL computed columns (filled by extraction if they win)
    t_side = [
        F.when(
            F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("D")
        ).otherwise(F.lit("U")).alias(op_col),
        *[F.col(c) for c in payload],
        *[F.col(c) for c in computed],
        F.lit(0).alias("_pref"),
    ]
    b_side = [
        F.col(op_col),
        *[F.col(c) for c in payload],
        *[F.lit(None).cast(types[c]).alias(c) for c in computed],
        F.lit(1).alias("_pref"),
    ]

    _, part_exprs = layout_exprs(key, n_parts, n_salts)
    pw = [f"_pw{i}" for i in range(len(part_exprs))]
    pw_aliased = [e.alias(a) for e, a in zip(part_exprs, pw)]
    # bucket must exist before the layout exprs reference it
    t_side.append(bucket_expr(key, n_buckets).alias(BUCKET_COL))
    b_side.append(bucket_expr(key, n_buckets).alias(BUCKET_COL))
    w = Window.partitionBy(*[F.col(a) for a in pw]).orderBy(
        F.col(key).asc(),
        *[F.col(c).desc() for c in order_cols],
        F.col("_pref").desc(),
    )
    prev_key = F.lag(F.col(key)).over(w)
    is_first = (F.row_number().over(w) == 1) | (~prev_key.eqNullSafe(F.col(key)))

    is_del = F.col(op_col) == "D"
    out_cols = []
    for f in cur_schema.fields:
        if f.name == DELETED_COL:
            out_cols.append(is_del.alias(f.name))
        elif f.name in computed:
            src_col = computed[f.name]
            # batch-won live rows extract; target-won rows pass their
            # stored value through. The UDF is evaluated eagerly for
            # every winner row, so non-extracting rows feed it NULL
            # (cheap) instead of gating with a CASE around the UDF.
            extracted = extract_text_udf(
                F.when((F.col("_pref") == 1) & ~is_del, F.col(src_col))
            )
            out_cols.append(
                F.when(
                    ~is_del,
                    F.when(F.col("_pref") == 1, extracted).otherwise(F.col(f.name)),
                )
                .cast(f.dataType)
                .alias(f.name)
            )
        elif f.name in (key, *order_cols):
            out_cols.append(F.col(f.name))
        else:
            out_cols.append(
                F.when(is_del, F.lit(None).cast(f.dataType))
                .otherwise(F.col(f.name))
                .alias(f.name)
            )
    out_cols.append(F.col(BUCKET_COL))
    built = {
        "t_side": t_side,
        "b_side": b_side,
        "pw_aliased": pw_aliased,
        "pw0": F.col(pw[0]),
        "first": is_first.alias("_first"),
        "out_cols": out_cols,
    }
    _EXPR_CACHE[ck] = built
    return built


def fused_mor_winners(
    normalized: DataFrame,
    key: str,
    op_col: str,
    order_cols: tuple[str, ...],
    cur_schema: T.StructType,
    computed: dict[str, str],
    n_buckets: int,
    batch_rows: int | None = None,
) -> DataFrame:
    """normalized (op + payload columns, already cast to the evolved
    schema) -> bucket-partitioned winner rows ready for a pre-partitioned
    parquet write. ``cur_schema`` is the evolved table schema including
    computed columns and the tombstone flag."""
    spark = normalized.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # spill-aware layout (lake/table.sort_layout): the exchange partition
    # count bounds each task's sorter to ~ROWS_PER_SORT_SHARD payload
    # rows, and the salt lets buckets occupy those partitions. The
    # repartition routes each (bucket, salt) group to an exactly-balanced
    # partition (lake/table.route_expr — kills the 9-14% balls-in-bins
    # straggler tail) and its hashpartitioning satisfies the window's
    # clustering requirement, so the plan still has exactly ONE exchange
    n_parts, n_salts = sort_layout(nparts, n_buckets, batch_rows)
    x = _fused_exprs(
        spark.sparkContext.applicationId, key, op_col, order_cols,
        cur_schema, tuple(sorted(computed.items())), n_buckets, n_parts,
        n_salts,
    )
    src = normalized.withColumn(BUCKET_COL, x["bucket"])
    src = src.select(F.col("*"), *x["pw_aliased"])
    src = src.repartition(n_parts, x["pw0"])
    sel = src.select(F.col("*"), *x["first_dup"])
    sel = sel.select(F.col("*"), x["dup_any"])
    winners = sel.where(F.col("_first"))
    return winners.select(*x["out_cols"])
