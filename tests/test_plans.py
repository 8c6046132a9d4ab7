"""Physical-plan assertions: the plans we designed for are the plans we get
(pushdown, pruning, broadcast, map-side partial aggregation)."""

from __future__ import annotations

from pyspark.sql import functions as F

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .where(F.col("l_shipdate") < "1996-01-01")
        .select("l_orderkey", "l_extendedprice")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # scan reads only the 3 referenced columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_shipdate" in plan


def test_broadcast_join_for_small_dim(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_lww_agg_is_partially_aggregated(spark):
    """The CDC dedup core must do map-side combine (skew resistance)."""
    from game_library_enrichment_etl_spark.operators.lww import lww_dedup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.concat(F.lit("u"), F.col("user_id")).alias("url"),
        F.col("ts").cast("timestamp").alias("warc_ts"),
        F.col("event_id").alias("lsn"),
    )
    plan = _plan(lww_dedup(ev, "url", ("warc_ts", "lsn")))
    assert "partial_max_by" in plan


def test_semi_anti_joins_planned(spark):
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey")
    )
    semi = cust.join(orders, "c_custkey", "left_semi")
    anti = cust.join(orders, "c_custkey", "left_anti")
    assert "LeftSemi" in _optimized(semi)
    assert "LeftAnti" in _optimized(anti)


def test_cosine_topk_broadcasts_queries(spark):
    from game_library_enrichment_etl_spark.operators.ann import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=2))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
