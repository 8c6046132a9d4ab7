"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises a named operator from SURVEY.md §2 (the
reference's operator inventory) or a training-data-pipeline operator, built
on game_library_enrichment_etl_spark. ``oracle_sql()`` holds the exact
ANSI-SQL mirror DuckDB runs on the same parquet views.

Determinism rules used throughout (so value hashes match across engines):
- doubles from aggregation go through DECIMAL or are rounded to 6 dp;
- timestamps leave queries as epoch seconds (bigint) or dates;
- every tie is broken by a unique key;
- text hashing uses the shared 60-bit md5 hash (verified identical in
  Spark `conv(substr(md5(x),1,15),16,10)` and DuckDB
  `('0x'||substr(md5(x),1,15))::UBIGINT`).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from game_library_enrichment_etl_spark.functions import text as TX
from game_library_enrichment_etl_spark.operators import ann as ANN
from game_library_enrichment_etl_spark.operators import dedup as DD
from game_library_enrichment_etl_spark.operators import relational as R
from game_library_enrichment_etl_spark.operators import reports as RP
from game_library_enrichment_etl_spark.operators import similarity as SIM
from game_library_enrichment_etl_spark.operators.multimodal import decode_binary_column


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect) mirroring functions/text.py exactly
# --------------------------------------------------------------------------
def _sql_norm(c: str) -> str:
    return f"trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"


def _sql_tokens(c: str) -> str:
    return f"string_split({_sql_norm(c)}, ' ')"


def _sql_hash(x: str) -> str:
    return f"(('0x' || substr(md5({x}), 1, 15))::UBIGINT)::BIGINT"


_SIM_SQL = (
    "round(100.0 * (1.0 - levenshtein({a}, {b})::DOUBLE / "
    "greatest(length({a}) + length({b}), 1)::DOUBLE), 4)"
)


# ==========================================================================
# entry — flagship: the CDC engine itself over a derived change stream
# ==========================================================================
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tail a WAL-style change stream derived from sf0.001 events
    through the full icelet CDC engine (LWW dedup -> COW MERGE -> snapshot)
    and return the final live table state."""
    return _cdc_apply_events(spark, "/root/testdata/sf0.001")


def _derive_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> change stream with the pages shape: key url, version
    (warc_ts=ts, lsn=event_id), D for purchases, payload from props."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.when(F.col("event_type") == "purchase", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("event_id").alias("lsn"),
        F.concat(F.lit("https://u"), F.col("user_id").cast("string")).alias("url"),
        # events.ts is parquet-naive -> TIMESTAMP_NTZ in Spark 4; the pages
        # table stores instants, so re-stamp as UTC instant (session tz=UTC)
        F.col("ts").cast("timestamp").alias("warc_ts"),
        F.when(F.col("event_type") != "purchase", F.col("props").cast("binary")).alias("html"),
        F.when(F.col("event_type") != "purchase", F.col("event_type")).alias("lang"),
        F.pmod(F.col("event_id"), F.lit(4)).cast("bigint").alias("batch_id"),
    )


def _cdc_apply_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from game_library_enrichment_etl_spark.cdc.apply import apply_batch
    from game_library_enrichment_etl_spark.cdc.tables import create_pages_table

    stream = _derive_change_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="icelet_entry_")
    table = create_pages_table(spark, os.path.join(root, "pages"), n_buckets=8)
    for b in range(4):
        apply_batch(table, stream.where(F.col("batch_id") == b))
    final = table.read()
    return final.select(
        "url",
        "lsn",
        F.unix_millis("warc_ts").alias("warc_ts_ms"),
        "lang",
        "text",
    ).orderBy("url")


_CDC_ORACLE = """
WITH stream AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op,
         event_id AS lsn,
         'https://u' || user_id::VARCHAR AS url,
         ts AS warc_ts,
         CASE WHEN event_type <> 'purchase' THEN event_type END AS lang,
         CASE WHEN event_type <> 'purchase' THEN props END AS payload
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
  FROM stream
)
SELECT url, lsn, epoch_ms(warc_ts)::BIGINT AS warc_ts_ms, lang,
       trim(regexp_replace(payload, '\\s+', ' ', 'g')) AS text
FROM ranked WHERE rn = 1 AND op <> 'D' ORDER BY url
"""


# ==========================================================================
# relational operator queries (SURVEY.md §2.2-2.8)
# ==========================================================================
def _q1_pricing_summary(spark, sf):  # A9-A11 aggregate surface (TPC-H Q1 shape)
    li = _t(spark, sf, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(
            (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
        ).cast("double").alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.orderBy("l_returnflag", "l_linestatus")


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
       CAST(sum(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
       CAST(sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def _lww_latest_event(spark, sf):  # A2 — the CDC dedup core as a window
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"))
    )


_LWW_SQL = """
SELECT user_id, event_id, event_type, epoch_ms(ts)::BIGINT AS ts_ms
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events) WHERE rn = 1
"""


def _grouped_max_filter(spark, sf):  # A1
    ev = _t(spark, sf, "events")
    return R.grouped_max_filter(ev, "user_id", "value").select(
        "user_id", "event_id", F.round("value", 6).alias("value")
    )


_A1_SQL = """
SELECT user_id, event_id, round(value, 6) AS value
FROM (SELECT *, max(value) OVER (PARTITION BY user_id) m FROM events)
WHERE value = m
"""


def _best_match_selection(spark, sf):  # A3 — hierarchical winner selection
    ev = _t(spark, sf, "events")
    return R.best_row_per_group(
        ev,
        "user_id",
        [
            (F.col("event_type") == "purchase").cast("int").desc(),
            F.abs(F.col("value") - 50.0).asc(),
            F.col("event_id").asc(),
        ],
    ).select("user_id", "event_id")


_A3_SQL = """
SELECT user_id, event_id
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY (CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) DESC,
                 abs(value - 50.0) ASC, event_id ASC) rn FROM events)
WHERE rn = 1
"""


def _upsert_merge(spark, sf):  # M1 — keyed upsert as anti-join + union
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = lambda df: (
        df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    )
    target = latest(ev.where(F.pmod("event_id", F.lit(3)) < 2)).select("user_id", "event_id")
    source = latest(ev.where(F.pmod("event_id", F.lit(3)) == 2)).select("user_id", "event_id")
    return R.upsert_by_key(target, source, "user_id")


_M1_SQL = """
WITH latest AS (SELECT user_id, event_id, row_number() OVER
        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events WHERE event_id % 3 < 2),
     tgt AS (SELECT user_id, event_id FROM latest WHERE rn = 1),
     lsrc AS (SELECT user_id, event_id, row_number() OVER
        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events WHERE event_id % 3 = 2),
     src AS (SELECT user_id, event_id FROM lsrc WHERE rn = 1)
SELECT user_id, event_id FROM tgt WHERE user_id NOT IN (SELECT user_id FROM src)
UNION ALL SELECT user_id, event_id FROM src
"""


def _insert_only_new(spark, sf):  # M3
    cust = _t(spark, sf, "customer")
    target = cust.where(F.pmod("c_custkey", F.lit(2)) == 0).select("c_custkey", "c_name")
    source = cust.select("c_custkey", "c_name")
    return R.insert_only_new(target, source, "c_custkey")


_M3_SQL = """
WITH tgt AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0)
SELECT c_custkey, c_name FROM tgt
UNION ALL
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT c_custkey FROM tgt)
"""


def _partial_update_fold(spark, sf):  # M2 — last non-null per column per key
    ev = _t(spark, sf, "events")
    ver = F.struct(F.col("ts").alias("v1"), F.col("event_id").alias("v2"))
    click = F.when(F.col("event_type") == "click", F.col("value"))
    purch = F.when(F.col("event_type") == "purchase", F.col("value"))
    g = ev.groupBy("user_id").agg(
        F.max(F.when(click.isNotNull(), F.struct(ver.alias("v"), click.alias("x"))))
        .getField("x").alias("last_click_raw"),
        F.max(F.when(purch.isNotNull(), F.struct(ver.alias("v"), purch.alias("x"))))
        .getField("x").alias("last_purchase_raw"),
    )
    return g.select(
        "user_id",
        F.round("last_click_raw", 6).alias("last_click_value"),
        F.round("last_purchase_raw", 6).alias("last_purchase_value"),
    )


_M2_SQL = """
SELECT user_id,
       round(last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'click'), 6)
         AS last_click_value,
       round(last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'purchase'), 6)
         AS last_purchase_value
FROM events GROUP BY user_id
"""


def _anti_join_unmatched(spark, sf):  # J5/J6/J7/J8
    cust, orders = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return R.unmatched(cust, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey").select(
        "c_custkey", "c_name"
    )


_J5_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def _semi_join(spark, sf):  # J1 state-probe shape
    cust, orders = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey")


_J1_SQL = """
SELECT c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def _left_join_enrich(spark, sf):  # J2/J3 — enrichment join, small side broadcast
    orders, cust = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    return orders.join(
        F.broadcast(cust.select("c_custkey", "c_name")),
        orders.o_custkey == cust.c_custkey,
        "left",
    ).select("o_orderkey", F.coalesce("c_name", F.lit("<none>")).alias("cust_name"))


_J2_SQL = """
SELECT o_orderkey, coalesce(c_name, '<none>') AS cust_name
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


def _union_dedup(spark, sf):  # U1 + A4/A5
    orders = _t(spark, sf, "orders")
    a = orders.where(F.pmod("o_orderkey", F.lit(3)) == 0).select("o_orderkey", "o_orderstatus")
    b = orders.where(F.pmod("o_orderkey", F.lit(3)) <= 1).select("o_orderkey", "o_orderstatus")
    return a.unionByName(b).dropDuplicates()


_U1_SQL = """
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0
UNION
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <= 1
"""


def _except_keys(spark, sf):  # U2
    orders, li = _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
    return (
        orders.select("o_orderkey")
        .distinct()
        .join(li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(), "o_orderkey", "left_anti")
    )


_U2_SQL = """
SELECT DISTINCT o_orderkey FROM orders
EXCEPT
SELECT DISTINCT l_orderkey AS o_orderkey FROM lineitem
"""


def _bridge_explode(spark, sf):  # E1 — stringified array decode -> bridge
    ev = _t(spark, sf, "events")
    with_arr = ev.select(
        "event_id",
        F.concat(
            F.lit("["),
            F.pmod("user_id", F.lit(5)).cast("string"),
            F.lit(","),
            F.pmod("user_id", F.lit(7)).cast("string"),
            F.lit("]"),
        ).alias("arr_json"),
    )
    return R.bridge_explode(with_arr, "event_id", "arr_json", "tag_id")


_E1_SQL = """
SELECT DISTINCT event_id, tag_id
FROM (SELECT event_id, unnest([user_id % 5, user_id % 7]) AS tag_id FROM events)
WHERE tag_id IS NOT NULL
"""


def _case_map_category(spark, sf):  # P12 — dict-lookup CASE over a tiny dim
    nation = _t(spark, sf, "nation")
    mapping = {0: "AFRICA", 1: "AMERICA", 2: "ASIA", 3: "EUROPE", 4: "MIDEAST"}
    return nation.select(
        "n_nationkey", "n_name", R.map_lookup(F.col("n_regionkey"), mapping, "UNKNOWN").alias("region_name")
    )


_P12_SQL = """
SELECT n_nationkey, n_name,
       CASE n_regionkey WHEN 0 THEN 'AFRICA' WHEN 1 THEN 'AMERICA' WHEN 2 THEN 'ASIA'
            WHEN 3 THEN 'EUROPE' WHEN 4 THEN 'MIDEAST' ELSE 'UNKNOWN' END AS region_name
FROM nation
"""


def _name_clean(spark, sf):  # P1/P2/P5/P7 — rename + suffix strip + punct map
    part = _t(spark, sf, "part")
    cleaned = F.regexp_replace(F.col("p_name"), r"\s(small|large|std)$", "")
    cleaned = F.regexp_replace(cleaned, "-", " ")
    return part.select("p_partkey", F.lower(cleaned).alias("clean_name"))


_P2_SQL = """
SELECT p_partkey,
       lower(regexp_replace(regexp_replace(p_name, '\\s(small|large|std)$', ''), '-', ' ', 'g'))
         AS clean_name
FROM part
"""


def _conditional_rewrite(spark, sf):
    """P7/P8 — conditional string rewrite + flag from substring (reference:
    startswith-rewrite and contains-flag columns,
    /root/reference/src/internet_games_database.py:235-241,600-614)."""
    part = _t(spark, sf, "part")
    name = F.col("p_name")
    rewritten = F.when(
        name.startswith("a"), F.concat(F.lit("anon:"), F.substring(name, 2, 1000))
    ).otherwise(name)
    return part.select(
        "p_partkey",
        rewritten.alias("rewritten_name"),
        name.contains("green").cast("int").alias("is_green"),
    )


_P7_SQL = """
SELECT p_partkey,
       CASE WHEN starts_with(p_name, 'a')
            THEN 'anon:' || substr(p_name, 2)
            ELSE p_name END AS rewritten_name,
       contains(p_name, 'green')::INT AS is_green
FROM part
"""


def _null_safe_filter(spark, sf):  # P3/P4 — negated contains, null-safe
    docs = _t(spark, sf, "documents")
    keep = ~F.coalesce(F.col("text").contains("data"), F.lit(False))
    return docs.where(keep & F.col("lang").isNotNull()).select("doc_id", "lang")


_P3_SQL = """
SELECT doc_id, lang FROM documents
WHERE NOT coalesce(contains(text, 'data'), FALSE) AND lang IS NOT NULL
"""


def _null_count_rank(spark, sf):  # P13 + A8 — completeness ranking
    ev = _t(spark, sf, "events")
    derived = ev.select(
        "user_id",
        "event_id",
        F.when(F.col("event_type") != "view", F.col("event_type")).alias("c1"),
        F.when(F.col("value") > 10.0, F.col("value")).alias("c2"),
        F.when(F.pmod("event_id", F.lit(5)) != 0, F.col("event_id")).alias("c3"),
    )
    ranked = derived.withColumn("n_nulls", R.null_count(["c1", "c2", "c3"]))
    return R.best_row_per_group(
        ranked, "user_id", [F.col("n_nulls").asc(), F.col("event_id").asc()]
    ).select("user_id", "event_id", "n_nulls")


_P13_SQL = """
WITH derived AS (
  SELECT user_id, event_id,
    (CASE WHEN event_type <> 'view' THEN event_type END IS NULL)::INT
    + (CASE WHEN value > 10.0 THEN value END IS NULL)::INT
    + (CASE WHEN event_id % 5 <> 0 THEN event_id END IS NULL)::INT AS n_nulls
  FROM events)
SELECT user_id, event_id, n_nulls
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_nulls ASC, event_id ASC) rn
      FROM derived)
WHERE rn = 1
"""


def _year_derive(spark, sf):  # P6/P9/P11 — casts, year extract, arithmetic
    orders = _t(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.round(F.col("o_totalprice").cast("decimal(18,2)") * F.lit(0.9).cast("decimal(3,1)"), 2)
        .cast("double")
        .alias("disc_price"),
        F.abs(F.year("o_orderdate") - F.lit(1995)).alias("year_diff"),
    )


_P6_SQL = """
SELECT o_orderkey, year(o_orderdate)::INT AS order_year,
       CAST(round(o_totalprice::DECIMAL(18,2) * 0.9::DECIMAL(3,1), 2) AS DOUBLE) AS disc_price,
       abs(year(o_orderdate) - 1995)::INT AS year_diff
FROM orders
"""


def _topk_per_group(spark, sf):  # O2 — window top-k
    orders = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    )


_O2_SQL = """
SELECT o_custkey, o_orderkey, rank FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders) WHERE rank <= 3
"""


def _global_sort_limit(spark, sf):  # O1/O3 — global sort + limit
    orders = _t(spark, sf, "orders")
    return (
        orders.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_ms"))
    )


_O1_SQL = """
SELECT o_orderkey, epoch_ms(o_orderdate)::BIGINT AS o_orderdate_ms
FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 10
"""


def _watermark_incremental(spark, sf):  # A7/S4/S5 — high-watermark scan
    ev = _t(spark, sf, "events")
    wm = ev.where(F.col("event_id") < 500).agg(F.max("ts").alias("wm"))
    newer = ev.join(F.broadcast(wm)).where(F.col("ts") > F.col("wm"))
    return newer.agg(
        F.count(F.lit(1)).alias("events_after_watermark"),
        F.min("event_id").alias("first_new_event"),
    )


_A7_SQL = """
WITH wm AS (SELECT max(ts) AS wm FROM events WHERE event_id < 500)
SELECT count(*) AS events_after_watermark, min(event_id) AS first_new_event
FROM events, wm WHERE ts > wm.wm
"""


def _recency_rescope(spark, sf):  # S4-adjacent — trailing re-enrichment scope
    """Recency re-extraction window (/root/reference/src/how_long_to_beat.py:59-62):
    keys whose LATEST event time falls inside a trailing window from the
    stream's max timestamp are re-qualified for enrichment even though
    already processed — the scope WIDENS (unlike lateness, which drops)."""
    ev = _t(spark, sf, "events")
    scoped = R.recency_rescope(ev, "user_id", "ts", window_s=4 * 3600)
    return scoped.select(
        "user_id", F.unix_millis(F.col("latest_ts").cast("timestamp")).alias("latest_ts_ms")
    )


_RECENCY_SQL = """
WITH a AS (SELECT max(ts) AS as_of FROM events),
l AS (SELECT user_id, max(ts) AS latest_ts FROM events GROUP BY user_id)
SELECT l.user_id, epoch_ms(l.latest_ts)::BIGINT AS latest_ts_ms
FROM l, a WHERE l.latest_ts >= a.as_of - INTERVAL 4 HOUR
"""


def _distinct_values(spark, sf):  # A6
    return _t(spark, sf, "events").select("event_type").where(F.col("event_type").isNotNull()).distinct()


_A6_SQL = "SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL"


def _value_counts_pct(spark, sf):  # A9/A10
    return R.value_counts_pct(_t(spark, sf, "events"), "event_type")


_A9_SQL = """
SELECT event_type, count(*) AS n,
       round(count(*)::DOUBLE * 100.0 / (SELECT count(*) FROM events), 6) AS pct
FROM events GROUP BY event_type
"""


def _summary_metrics(spark, sf):  # A11
    ev = _t(spark, sf, "events")
    return R.summary_metrics(ev, F.col("event_type") == "purchase", "purchases")


_A11_SQL = """
SELECT count(*) AS total,
       CAST(sum((event_type = 'purchase')::INT) AS BIGINT) AS purchases,
       round(sum((event_type = 'purchase')::INT)::DOUBLE / count(*), 6) AS purchases_rate
FROM events
"""


def _fuzzy_blocked_join(spark, sf):  # J9/J10 — THE reference enrichment join
    part = _t(spark, sf, "part")
    left = part.where(F.pmod("p_partkey", F.lit(20)) == 0).select("p_partkey", "p_name")
    right = part.where(F.pmod("p_partkey", F.lit(20)) != 0).select("p_partkey", "p_name")
    out = SIM.blocked_similarity_join(
        left, right, "p_partkey", "p_name", "p_partkey", "p_name", threshold=50.0,
        fallback_full_scan=False,
    )
    return out.select("l_key", "match_key", "similarity")


_J9_SQL = f"""
WITH l AS (SELECT p_partkey AS l_key, p_name AS l_txt,
                  lower(substr(p_name, 1, 1)) AS blk
           FROM part WHERE p_partkey % 20 = 0),
     r AS (SELECT p_partkey AS r_key, p_name AS r_txt,
                  lower(substr(p_name, 1, 1)) AS blk
           FROM part WHERE p_partkey % 20 <> 0 AND p_name IS NOT NULL),
     scored AS (
       SELECT l.l_key, r.r_key,
              {_SIM_SQL.format(a='l.l_txt', b='r.r_txt')} AS similarity
       FROM l JOIN r USING (blk)),
     best AS (
       SELECT l_key, r_key, similarity,
              row_number() OVER (PARTITION BY l_key ORDER BY similarity DESC, r_key ASC) rn
       FROM scored)
SELECT l.l_key,
       b.r_key AS match_key,
       b.similarity
FROM l LEFT JOIN (SELECT * FROM best WHERE rn = 1 AND similarity >= 50.0) b USING (l_key)
"""


def _fuzzy_blocked_join_fallback(spark, sf):
    """J9 with the reference's empty-block fallback
    (/root/reference/src/internet_games_database.py:459-466): every 40th
    left name is prefixed with '##' so its block key exists on no candidate;
    those rows must be scored against the FULL candidate list instead of
    getting a silent null match."""
    part = _t(spark, sf, "part")
    left = (
        part.where(F.pmod("p_partkey", F.lit(20)) == 0)
        .select(
            "p_partkey",
            F.when(
                F.pmod("p_partkey", F.lit(40)) == 0, F.concat(F.lit("##"), F.col("p_name"))
            )
            .otherwise(F.col("p_name"))
            .alias("p_name"),
        )
    )
    right = part.where(F.pmod("p_partkey", F.lit(20)) != 0).select("p_partkey", "p_name")
    out = SIM.blocked_similarity_join(
        left, right, "p_partkey", "p_name", "p_partkey", "p_name", threshold=50.0,
        fallback_full_scan=True,
    )
    return out.select("l_key", "match_key", "similarity")


_J9F_SQL = f"""
WITH l0 AS (SELECT p_partkey AS l_key,
                   CASE WHEN p_partkey % 40 = 0 THEN '##' || p_name ELSE p_name END AS l_txt
            FROM part WHERE p_partkey % 20 = 0),
     l1 AS (SELECT l_key, l_txt, lower(substr(l_txt, 1, 1)) AS blk FROM l0),
     r AS (SELECT p_partkey AS r_key, p_name AS r_txt,
                  lower(substr(p_name, 1, 1)) AS blk
           FROM part WHERE p_partkey % 20 <> 0 AND p_name IS NOT NULL),
     l AS (SELECT l_key, l_txt,
                  CASE WHEN blk IN (SELECT DISTINCT blk FROM r) THEN blk
                       ELSE '@@fallback' END AS blk
           FROM l1),
     r2 AS (SELECT r_key, r_txt, blk FROM r
            UNION ALL
            SELECT r_key, r_txt, '@@fallback' AS blk FROM r),
     scored AS (
       SELECT l.l_key, r2.r_key,
              {_SIM_SQL.format(a='l.l_txt', b='r2.r_txt')} AS similarity
       FROM l JOIN r2 USING (blk)),
     best AS (
       SELECT l_key, r_key, similarity,
              row_number() OVER (PARTITION BY l_key ORDER BY similarity DESC, r_key ASC) rn
       FROM scored)
SELECT l.l_key,
       b.r_key AS match_key,
       b.similarity
FROM l LEFT JOIN (SELECT * FROM best WHERE rn = 1 AND similarity >= 50.0) b USING (l_key)
"""


def _fuzzy_matched(spark, sf):
    part = _t(spark, sf, "part")
    left = part.where(F.pmod("p_partkey", F.lit(20)) == 0).select("p_partkey", "p_name")
    right = part.where(F.pmod("p_partkey", F.lit(20)) != 0).select("p_partkey", "p_name")
    return SIM.blocked_similarity_join(
        left, right, "p_partkey", "p_name", "p_partkey", "p_name", threshold=50.0,
        fallback_full_scan=False,
    )


def _fuzzy_matched_mangled(spark, sf, threshold: float):
    """Fuzzy match with deterministically perturbed left names (a ' q' +
    variable 'z'-run suffix), so similarities spread below 100 and the
    issue reports have real rows to quarantine — the reference's inputs
    are two genuinely different catalogs, this reproduces that shape."""
    part = _t(spark, sf, "part")
    left = part.where(F.pmod("p_partkey", F.lit(20)) == 0).select(
        "p_partkey",
        F.concat(
            F.col("p_name"), F.lit(" q"),
            F.expr("repeat('z', CAST(p_partkey % 11 AS INT))"),
        ).alias("p_name"),
    )
    right = part.where(F.pmod("p_partkey", F.lit(20)) != 0).select("p_partkey", "p_name")
    return SIM.blocked_similarity_join(
        left, right, "p_partkey", "p_name", "p_partkey", "p_name",
        threshold=threshold, fallback_full_scan=False,
    )


_MANGLED_CTE = """
l AS (SELECT p_partkey AS l_key,
             p_name || ' q' || repeat('z', (p_partkey % 11)::INT) AS l_txt,
             lower(substr(p_name, 1, 1)) AS blk
      FROM part WHERE p_partkey % 20 = 0),
r AS (SELECT p_partkey AS r_key, p_name AS r_txt,
             lower(substr(p_name, 1, 1)) AS blk
      FROM part WHERE p_partkey % 20 <> 0 AND p_name IS NOT NULL),
scored AS (
  SELECT l.l_key, r.r_key,
         {sim} AS similarity
  FROM l JOIN r USING (blk)),
best AS (
  SELECT l_key, r_key, similarity,
         row_number() OVER (PARTITION BY l_key ORDER BY similarity DESC, r_key ASC) rn
  FROM scored)
""".format(sim=_SIM_SQL.format(a="l.l_txt", b="r.r_txt"))


def _low_similarity_report(spark, sf):  # S10 — low_similarity_games.csv analog
    out = RP.low_similarity_report(
        _fuzzy_matched_mangled(spark, sf, threshold=50.0), threshold_low=75.0
    )
    return out.select("l_key", "match_key", "similarity")


_LOWSIM_SQL = f"""
WITH {_MANGLED_CTE}
SELECT l_key, r_key AS match_key, similarity
FROM best WHERE rn = 1 AND similarity >= 50.0 AND similarity < 75.0
"""


def _unmatched_report(spark, sf):  # S10 — no_hltb_records.csv analog
    return RP.unmatched_report(_fuzzy_matched_mangled(spark, sf, threshold=75.0))


_UNMATCHED_SQL = f"""
WITH {_MANGLED_CTE}
SELECT l.l_key, l.l_txt
FROM l LEFT JOIN (SELECT * FROM best WHERE rn = 1 AND similarity >= 75.0) b USING (l_key)
WHERE b.r_key IS NULL
"""


def _attr_mismatch_report(spark, sf):  # S10 — year_mismatches.csv analog
    part = _t(spark, sf, "part")
    left = part.where(F.pmod("p_partkey", F.lit(20)) == 0)
    right = part.where(F.pmod("p_partkey", F.lit(20)) != 0)
    out = RP.attribute_mismatch_report(
        _fuzzy_matched(spark, sf), left, right,
        "p_partkey", "p_partkey", "p_size", "p_size",
    )
    return out.select(
        "l_key", "match_key", "similarity",
        F.col("l_attr").cast("int").alias("l_attr"),
        F.col("r_attr").cast("int").alias("r_attr"),
    )


_ATTR_MISMATCH_SQL = f"""
SELECT m.l_key, m.match_key, m.similarity,
       lp.p_size::INT AS l_attr, rp.p_size::INT AS r_attr
FROM ({_J9_SQL}) m
JOIN part lp ON lp.p_partkey = m.l_key
JOIN part rp ON rp.p_partkey = m.match_key
WHERE m.match_key IS NOT NULL
  AND lp.p_size IS DISTINCT FROM rp.p_size
"""


def _category_analysis(spark, sf):  # S10 — category_analysis.csv analog
    return RP.category_analysis(_t(spark, sf, "orders"), "o_orderpriority")


_CATEGORY_SQL = """
SELECT o_orderpriority, count(*) AS n,
       round(count(*)::DOUBLE / sum(count(*)) OVER (), 6) AS pct
FROM orders GROUP BY o_orderpriority
"""


# ==========================================================================
# training-data pipeline operators (dedup / text / ANN / multimodal)
# ==========================================================================
def _exact_dedup_docs(spark, sf):
    return DD.exact_dedup(_t(spark, sf, "documents"))


_EXACT_DEDUP_SQL = f"""
SELECT md5({_sql_norm('text')}) AS fingerprint, count(*) AS n_docs, min(doc_id) AS keeper
FROM documents GROUP BY 1
"""


_MH_N, _MH_BANDS, _MH_SHINGLE = 12, 4, 3


def _minhash_lsh_pairs(spark, sf):
    return DD.minhash_lsh_pairs(
        _t(spark, sf, "documents"),
        n_hashes=_MH_N,
        bands=_MH_BANDS,
        shingle_n=_MH_SHINGLE,
        jaccard_threshold=0.5,
    )


def _minhash_sql() -> str:
    from game_library_enrichment_etl_spark.operators.dedup import (
        MINHASH_P,
        minhash_params,
    )

    rows = _MH_N // _MH_BANDS
    toks = _sql_tokens("text")
    sh = (
        f"list_distinct([array_to_string(t.toks[i:i+{_MH_SHINGLE - 1}], ' ') "
        f"for i in range(1, greatest(len(t.toks) - {_MH_SHINGLE - 1}, 1) + 1)])"
    )
    mh = ", ".join(
        f"list_min([({a} * h + {b}) % {MINHASH_P} for h in hs]) AS mh{i}"
        for i, (a, b) in enumerate(minhash_params(_MH_N))
    )
    bands = ", ".join(
        "md5(" + " || ',' || ".join(
            [f"'{b}'"] + [f"mh{b * rows + r}::VARCHAR" for r in range(rows)]
        ) + f") AS band{b}"
        for b in range(_MH_BANDS)
    )
    band_unnest = ", ".join(f"band{b}" for b in range(_MH_BANDS))
    return f"""
WITH base AS (
  SELECT doc_id AS k, {sh} AS sh
  FROM (SELECT doc_id, text, {toks} AS toks FROM documents) t
), hashed AS (
  SELECT k, sh, [({_sql_hash('s')} % 2147483648) for s in sh] AS hs FROM base
), sigs AS (
  SELECT k, sh, {mh} FROM hashed
), banded AS (
  SELECT k, sh, unnest([{band_unnest}]) AS band
  FROM (SELECT *, {bands} FROM sigs)
), cand AS (
  SELECT DISTINCT a.k AS key_a, b.k AS key_b
  FROM banded a JOIN banded b USING (band) WHERE a.k < b.k
), verified AS (
  SELECT c.key_a, c.key_b,
         round(len(list_intersect(x.sh, y.sh))::DOUBLE /
               greatest(len(list_distinct(x.sh || y.sh)), 1)::DOUBLE, 6) AS jaccard
  FROM cand c JOIN base x ON x.k = c.key_a JOIN base y ON y.k = c.key_b
)
SELECT key_a, key_b, jaccard FROM verified WHERE jaccard >= 0.5
"""


def _repart(spark, df):
    # documents.parquet is a single file -> one scan partition; heavy
    # per-row expression stages need an explicit fan-out to use all cores
    return df.repartition(spark.sparkContext.defaultParallelism)


def _simhash_docs(spark, sf):
    docs = _repart(spark, _t(spark, sf, "documents"))
    hashed = docs.select("doc_id", DD.token_hashes(F.col("text")).alias("ths"))
    return hashed.select("doc_id", DD.simhash_from_hashes(F.col("ths")).alias("simhash"))


def _simhash_sql() -> str:
    toks = _sql_tokens("text")
    h = _sql_hash("tok")
    bits = " + ".join(
        f"(CASE WHEN list_sum([CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END "
        f"for h in hs]) > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(32)
    )
    return f"""
SELECT doc_id, ({bits}) AS simhash
FROM (SELECT doc_id, [{h} for tok in {toks}] AS hs FROM documents)
"""


def _simhash_pairs(spark, sf):
    """Banded SimHash near-dup candidate pairs (pigeonhole-exact for
    hamming <= n_chunks - 1); the oracle brute-forces all pairs — identical
    result set, which is exactly the exactness claim under test."""
    out = DD.simhash_pairs(
        _repart(spark, _t(spark, sf, "documents")), max_hamming=3, n_chunks=4
    )
    return out.select("key_a", "key_b", F.col("hamming").cast("int").alias("hamming"))


def _simhash_pairs_sql() -> str:
    return f"""
WITH s AS ({_simhash_sql()})
SELECT a.doc_id AS key_a, b.doc_id AS key_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def _ngram_jaccard_pairs(spark, sf):
    return DD.ngram_jaccard_pairs(_t(spark, sf, "documents"), n=5, threshold=0.7)


def _ngram_sql() -> str:
    norm = _sql_norm("text")
    gh = _sql_hash("s")
    return f"""
WITH grams AS (
  SELECT doc_id AS k,
         [{gh} for s in
          list_distinct([substr(nt, i, 5)
                         for i in range(1, greatest(length(nt) - 4, 1) + 1)])] AS g
  FROM (SELECT doc_id, {norm} AS nt FROM documents)
), eg AS (
  SELECT k, unnest(g) AS gram FROM grams
), dfreq AS (
  SELECT gram, count(*) AS dfc FROM eg GROUP BY gram
), per_doc AS (
  SELECT k, list(gram ORDER BY dfc, gram) AS sg, count(*)::INT AS sz
  FROM eg JOIN dfreq USING (gram) GROUP BY k
), pe AS (
  SELECT k, sz, unnest(sg[1 : sz - ceil(0.7 * sz)::INT + 1]) AS gram FROM per_doc
), cand AS (
  SELECT DISTINCT a.k AS key_a, b.k AS key_b
  FROM pe a JOIN pe b USING (gram)
  WHERE a.k < b.k
    AND a.sz::DOUBLE >= 0.7 * b.sz AND b.sz::DOUBLE >= 0.7 * a.sz
)
SELECT c.key_a, c.key_b,
       round(len(list_intersect(x.g, y.g))::DOUBLE /
             greatest(len(list_distinct(x.g || y.g)), 1)::DOUBLE, 6) AS jaccard
FROM cand c JOIN grams x ON x.k = c.key_a JOIN grams y ON y.k = c.key_b
WHERE len(list_intersect(x.g, y.g))::DOUBLE /
      greatest(len(list_distinct(x.g || y.g)), 1)::DOUBLE >= 0.7
"""


def _embedding_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ANN.cosine_topk(emb, queries, k=5)


_ANN_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
     scored AS (
       SELECT q.query_id, e.vec_id AS neighbor_id,
              round(
                list_reduce(list_transform(range(1, len(e.embedding) + 1),
                    i -> q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE), (a, b) -> a + b)
                / greatest(
                    sqrt(list_reduce(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE), (a,b) -> a+b))
                  * sqrt(list_reduce(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE), (a,b) -> a+b)),
                  1e-12), 6) AS cosine
       FROM embeddings e CROSS JOIN q WHERE q.query_id <> e.vec_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored) WHERE rank <= 5
"""


def _embedding_srp_ann(spark, sf):
    emb = _t(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ANN.srp_lsh_topk(emb, queries, k=5, n_bits=8, dim=64, multiprobe_flips=1)


def _srp_sql() -> str:
    # reproduce the exact ±1 plane literals used by operators/ann.py
    planes = []
    for r in range(8):
        w = [
            "1" if int.from_bytes(hashlib.md5(f"srp|{r}|{d}".encode()).digest()[:8], "big") % 2 == 0 else "-1"
            for d in range(64)
        ]
        planes.append("[" + ",".join(w) + "]")
    bkt_bits = " + ".join(
        f"(CASE WHEN list_reduce(list_transform(range(1, 65), "
        f"i -> embedding[i]::DOUBLE * ({planes[r]})[i]::DOUBLE), (a,b) -> a+b) > 0 "
        f"THEN {1 << r} ELSE 0 END)"
        for r in range(8)
    )
    probes = ", ".join(["bkt0"] + [f"xor(bkt0::BIGINT, {1 << r})::INT" for r in range(8)])
    return f"""
WITH c AS (SELECT vec_id AS neighbor_id, embedding AS cv, ({bkt_bits})::INT AS bkt
           FROM embeddings),
     q0 AS (SELECT vec_id AS query_id, embedding AS qv, ({bkt_bits})::INT AS bkt0
            FROM embeddings WHERE vec_id < 5),
     q AS (SELECT query_id, qv, unnest([{probes}]) AS bkt FROM q0),
     scored AS (
       SELECT DISTINCT q.query_id, c.neighbor_id,
              round(
                list_reduce(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * c.cv[i]::DOUBLE), (a,b) -> a+b)
                / greatest(
                    sqrt(list_reduce(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE), (a,b) -> a+b))
                  * sqrt(list_reduce(list_transform(c.cv, x -> x::DOUBLE * x::DOUBLE), (a,b) -> a+b)),
                  1e-12), 6) AS cosine
       FROM c JOIN q USING (bkt) WHERE q.query_id <> c.neighbor_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored) WHERE rank <= 5
"""


def _lang_id_docs(spark, sf):
    docs = _repart(spark, _t(spark, sf, "documents"))
    return docs.select("doc_id", TX.lang_id(F.col("text")).alias("lang_guess"))


def _lang_id_docs_np(spark, sf):
    """numpy fast path (functions/text_np.py) — same oracle as the
    Catalyst spec version: value-equality IS the check."""
    from game_library_enrichment_etl_spark.functions.text_np import lang_id_np

    docs = _repart(spark, _t(spark, sf, "documents"))
    return docs.select("doc_id", lang_id_np()(F.col("text")).alias("lang_guess"))


def _quality_token_stats_np(spark, sf):
    """numpy fast path for the quality/token stats — same oracle SQL."""
    from game_library_enrichment_etl_spark.functions.text_np import (
        quality_token_stats_np,
    )

    docs = _repart(spark, _t(spark, sf, "documents"))
    s = docs.select("doc_id", quality_token_stats_np()(F.col("text")).alias("s"))
    return s.select(
        "doc_id",
        F.col("s.n_tokens").alias("n_tokens"),
        F.col("s.n_bpe_tokens").alias("n_bpe_tokens"),
        F.col("s.punct_ratio").alias("punct_ratio"),
        F.col("s.quality").alias("quality"),
    )


def _embedding_srp_ann_np(spark, sf):
    """SRP buckets via one numpy matmul per Arrow batch — same oracle."""
    emb = _t(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ANN.srp_lsh_topk(
        emb, queries, k=5, n_bits=8, dim=64, multiprobe_flips=1, vectorized=True
    )


def _lang_id_sql() -> str:
    toks = _sql_tokens("text")
    langs = sorted(TX.LANG_STOPWORDS)
    rows = ", ".join(
        "('" + lang + "', ["
        + ",".join("'" + w + "'" for w in TX.LANG_STOPWORDS[lang])
        + "])"
        for lang in langs
    )
    return f"""
WITH docs AS (SELECT doc_id, {toks} AS toks FROM documents),
     langs(lang, sw) AS (VALUES {rows}),
     votes AS (
       SELECT d.doc_id, l.lang,
              len(list_filter(d.toks, t -> list_contains(l.sw, t))) AS n
       FROM docs d CROSS JOIN langs l),
     best AS (
       SELECT doc_id, lang, n,
              row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang ASC) rn
       FROM votes)
SELECT doc_id, CASE WHEN n > 0 THEN lang ELSE 'und' END AS lang_guess
FROM best WHERE rn = 1
"""


def _quality_token_stats(spark, sf):
    docs = _repart(spark, _t(spark, sf, "documents"))
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.round(TX.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        TX.quality_score(F.col("text")).alias("quality"),
    )


def _quality_sql() -> str:
    norm = _sql_norm("text")
    toks = _sql_tokens("text")
    sw_en = "[" + ",".join("'" + w + "'" for w in TX.LANG_STOPWORDS["en"]) + "]"
    n_tok = f"(CASE WHEN length({norm}) = 0 THEN 0 ELSE len({toks}) END)"
    punct = "(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))"
    punct_ratio = f"(CASE WHEN length(text) > 0 THEN {punct}::DOUBLE / length(text)::DOUBLE ELSE 0.0 END)"
    sw_ratio = (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, t -> list_contains({sw_en}, t)))::DOUBLE / len({toks})::DOUBLE "
        f"ELSE 0.0 END)"
    )
    mean_wl = (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"list_sum(list_transform({toks}, t -> length(t)))::DOUBLE / len({toks})::DOUBLE "
        f"ELSE 0.0 END)"
    )
    bpe_words = (
        "(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
        "len(regexp_split_to_array(trim(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), '\\s+')) END)"
    )
    quality = (
        f"round((CASE WHEN {n_tok} >= 5 AND {n_tok} <= 5000 THEN 0.4 ELSE 0.0 END)"
        f" + (CASE WHEN {sw_ratio} >= 0.05 THEN 0.3 ELSE 0.0 END)"
        f" + (CASE WHEN {punct_ratio} <= 0.2 THEN 0.2 ELSE 0.0 END)"
        f" + (CASE WHEN {mean_wl} >= 2.0 AND {mean_wl} <= 12.0 THEN 0.1 ELSE 0.0 END), 6)"
    )
    return f"""
SELECT doc_id,
       {n_tok}::BIGINT AS n_tokens,
       ({bpe_words} + {punct})::BIGINT AS n_bpe_tokens,
       round({punct_ratio}, 6) AS punct_ratio,
       {quality} AS quality
FROM documents
"""


def _doc_fingerprint(spark, sf):
    docs = _repart(spark, _t(spark, sf, "documents"))
    return docs.select(
        "doc_id",
        TX.doc_fingerprint(F.col("text")).alias("fingerprint"),
        TX.rolling_min_hash(F.col("text"), 8).alias("rolling_minhash"),
    )


def _fingerprint_sql() -> str:
    norm = _sql_norm("text")
    h = _sql_hash("g")
    return f"""
SELECT doc_id, md5({norm}) AS fingerprint,
       list_min([{h} for g in
         [substr(nt, i, 8) for i in range(1, greatest(length(nt) - 7, 1) + 1)]])
         AS rolling_minhash
FROM (SELECT doc_id, {norm} AS nt, text FROM documents)
"""


def _multimodal_decode(spark, sf):
    docs = _t(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    out = decode_binary_column(docs, "doc_id", "blob")
    return out.select("doc_id", "n_bytes", "width", "height")


_MM_SQL = """
SELECT doc_id, octet_length(text::BLOB)::BIGINT AS n_bytes,
       (64 + octet_length(text::BLOB) % 577)::INT AS width,
       (64 + (octet_length(text::BLOB) * 31) % 433)::INT AS height
FROM documents
"""


# ==========================================================================
# contract
# ==========================================================================
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_apply_events": _cdc_apply_events,
        "q1_pricing_summary": _q1_pricing_summary,
        "lww_latest_event": _lww_latest_event,
        "grouped_max_filter": _grouped_max_filter,
        "best_match_selection": _best_match_selection,
        "upsert_merge": _upsert_merge,
        "insert_only_new": _insert_only_new,
        "partial_update_fold": _partial_update_fold,
        "anti_join_unmatched": _anti_join_unmatched,
        "semi_join": _semi_join,
        "left_join_enrich": _left_join_enrich,
        "union_dedup": _union_dedup,
        "except_keys": _except_keys,
        "bridge_explode": _bridge_explode,
        "case_map_category": _case_map_category,
        "name_clean": _name_clean,
        "null_safe_filter": _null_safe_filter,
        "conditional_rewrite": _conditional_rewrite,
        "null_count_rank": _null_count_rank,
        "year_derive": _year_derive,
        "topk_per_group": _topk_per_group,
        "global_sort_limit": _global_sort_limit,
        "watermark_incremental": _watermark_incremental,
        "recency_rescope": _recency_rescope,
        "distinct_values": _distinct_values,
        "value_counts_pct": _value_counts_pct,
        "summary_metrics": _summary_metrics,
        "fuzzy_blocked_join": _fuzzy_blocked_join,
        "fuzzy_blocked_join_fallback": _fuzzy_blocked_join_fallback,
        "low_similarity_report": _low_similarity_report,
        "unmatched_report": _unmatched_report,
        "attr_mismatch_report": _attr_mismatch_report,
        "category_analysis": _category_analysis,
        "exact_dedup_docs": _exact_dedup_docs,
        "minhash_lsh_pairs": _minhash_lsh_pairs,
        "simhash_docs": _simhash_docs,
        "simhash_pairs": _simhash_pairs,
        "ngram_jaccard_pairs": _ngram_jaccard_pairs,
        "embedding_topk_cosine": _embedding_topk,
        "embedding_srp_ann": _embedding_srp_ann,
        "embedding_srp_ann_np": _embedding_srp_ann_np,
        "lang_id_docs": _lang_id_docs,
        "lang_id_docs_np": _lang_id_docs_np,
        "quality_token_stats": _quality_token_stats,
        "quality_token_stats_np": _quality_token_stats_np,
        "doc_fingerprint": _doc_fingerprint,
        "multimodal_decode": _multimodal_decode,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_apply_events": _CDC_ORACLE,
        "q1_pricing_summary": _Q1_SQL,
        "lww_latest_event": _LWW_SQL,
        "grouped_max_filter": _A1_SQL,
        "best_match_selection": _A3_SQL,
        "upsert_merge": _M1_SQL,
        "insert_only_new": _M3_SQL,
        "partial_update_fold": _M2_SQL,
        "anti_join_unmatched": _J5_SQL,
        "semi_join": _J1_SQL,
        "left_join_enrich": _J2_SQL,
        "union_dedup": _U1_SQL,
        "except_keys": _U2_SQL,
        "bridge_explode": _E1_SQL,
        "case_map_category": _P12_SQL,
        "name_clean": _P2_SQL,
        "null_safe_filter": _P3_SQL,
        "conditional_rewrite": _P7_SQL,
        "null_count_rank": _P13_SQL,
        "year_derive": _P6_SQL,
        "topk_per_group": _O2_SQL,
        "global_sort_limit": _O1_SQL,
        "watermark_incremental": _A7_SQL,
        "recency_rescope": _RECENCY_SQL,
        "distinct_values": _A6_SQL,
        "value_counts_pct": _A9_SQL,
        "summary_metrics": _A11_SQL,
        "fuzzy_blocked_join": _J9_SQL,
        "fuzzy_blocked_join_fallback": _J9F_SQL,
        "low_similarity_report": _LOWSIM_SQL,
        "unmatched_report": _UNMATCHED_SQL,
        "attr_mismatch_report": _ATTR_MISMATCH_SQL,
        "category_analysis": _CATEGORY_SQL,
        "exact_dedup_docs": _EXACT_DEDUP_SQL,
        "minhash_lsh_pairs": _minhash_sql(),
        "simhash_docs": _simhash_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        "ngram_jaccard_pairs": _ngram_sql(),
        "embedding_topk_cosine": _ANN_SQL,
        "embedding_srp_ann": _srp_sql(),
        "embedding_srp_ann_np": _srp_sql(),
        "lang_id_docs": _lang_id_sql(),
        "lang_id_docs_np": _lang_id_sql(),
        "quality_token_stats": _quality_sql(),
        "quality_token_stats_np": _quality_sql(),
        "doc_fingerprint": _fingerprint_sql(),
        "multimodal_decode": _MM_SQL,
    }
