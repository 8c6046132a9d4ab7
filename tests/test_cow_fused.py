"""Focused tests for the r6 COW union-merge (cdc/fused.fused_cow_merge):

1. Equivalence: the union + window formulation produces exactly the rows
   the full-outer-join formulation (cdc/apply._merge) produces, on a frame
   exercising every merge case — target-only live row, target-only
   tombstone, batch-only insert, batch-only delete, batch newer than
   target, batch STALE (older than target), exact version tie (source
   must win), and multiple batch rows per key (in-batch LWW).
2. Plan shape: exactly ONE exchange, and extraction sits above the winner
   filter (losers and target-won rows never feed Python real html).
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import functions as F

from game_library_enrichment_etl_spark.cdc.apply import _merge
from game_library_enrichment_etl_spark.cdc.fused import fused_cow_merge
from game_library_enrichment_etl_spark.cdc.tables import PAGES_SCHEMA
from game_library_enrichment_etl_spark.functions.extract import extract_text_udf
from game_library_enrichment_etl_spark.lake.schema import TableSchema
from game_library_enrichment_etl_spark.lake.table import BUCKET_COL, bucket_expr
from game_library_enrichment_etl_spark.operators.lww import lww_dedup


def _ts(s: int):
    return dt.datetime(2030, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(seconds=s)


def _frames(spark):
    cur = TableSchema.from_spark(PAGES_SCHEMA, 0)
    # target: (url, warc_ts, lsn, html, text, lang, _deleted)
    target = spark.createDataFrame(
        [
            ("u/target-only", _ts(10), 10, b"<p>t1</p>", "t1", "en", False),
            ("u/tombstone", _ts(11), 11, None, None, None, True),
            ("u/batch-newer", _ts(12), 12, b"<p>old</p>", "old", "en", False),
            ("u/batch-stale", _ts(50), 50, b"<p>kept</p>", "kept", "en", False),
            ("u/tie", _ts(20), 20, b"<p>t-tie</p>", "t-tie", "en", False),
        ],
        PAGES_SCHEMA,
    )
    batch_schema = "op string, url string, warc_ts timestamp, lsn long, html binary, lang string"
    batch = spark.createDataFrame(
        [
            ("U", "u/batch-only", _ts(30), 30, b"<p>new doc</p>", "en"),
            ("D", "u/batch-del", _ts(31), 31, None, None),
            ("U", "u/batch-newer", _ts(40), 40, b"<p>fresh</p>", "en"),
            ("U", "u/batch-stale", _ts(41), 41, b"<p>loses</p>", "en"),
            ("U", "u/tie", _ts(20), 20, b"<p>s-tie</p>", "en"),
            # in-batch LWW: three versions of one key, middle one a delete
            ("U", "u/multi", _ts(60), 60, b"<p>v1</p>", "en"),
            ("D", "u/multi", _ts(61), 61, None, None),
            ("U", "u/multi", _ts(62), 62, b"<p>v3 wins</p>", "en"),
        ],
        batch_schema,
    )
    return cur, target, batch


def _rows(df):
    cols = [f.name for f in PAGES_SCHEMA.fields]
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def test_cow_union_merge_equals_join_merge(spark):
    cur, target, batch = _frames(spark)
    computed = {"text": "html"}

    # join formulation (the r6-start path, still serving coalesce mode)
    winners = lww_dedup(batch, "url", ("warc_ts", "lsn"), strategy="agg",
                        unique_versions=True)
    winners = winners.withColumn(
        "text", F.when(F.col("op") != "D", extract_text_udf(F.col("html")))
    ).withColumn(BUCKET_COL, bucket_expr("url", 8))
    joined = _merge(target, winners, "url", ("warc_ts", "lsn"), cur, computed,
                    "overwrite")

    fused = fused_cow_merge(target, batch, "url", "op", ("warc_ts", "lsn"),
                            cur.to_spark(), computed, 8, total_rows=16)

    want = _rows(joined)
    got = _rows(fused)
    assert got == want, f"union merge diverges from join merge:\n{got}\nvs\n{want}"
    # spot-check the interesting cases landed as designed
    by_url = {r[0]: r for r in got}
    assert by_url["u/batch-stale"][4] == "kept"          # stale replay lost
    assert by_url["u/tie"][4] == "s-tie"                 # tie -> source wins
    assert by_url["u/multi"][4] == "v3 wins"             # in-batch LWW
    assert by_url["u/batch-del"][6] is True              # delete tombstoned
    assert by_url["u/tombstone"][6] is True              # tombstone carried


def test_cow_union_merge_plan_shape(spark):
    cur, target, batch = _frames(spark)
    fused = fused_cow_merge(target, batch, "url", "op", ("warc_ts", "lsn"),
                            cur.to_spark(), {"text": "html"}, 8, total_rows=16)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, f"expected exactly one exchange:\n{plan}"
    n_sorts = len(re.findall(r"(?:\+- |^)(?:\*\(\d+\) )?Sort \[", plan, re.M))
    assert n_sorts == 1, f"expected exactly one sort:\n{plan}"
    # extraction above the winner filter: losers never reach Python
    i_filt, i_py = plan.index("Filter"), plan.index("ArrowEvalPython")
    assert i_py < i_filt, f"extraction must sit above the winner filter:\n{plan}"
