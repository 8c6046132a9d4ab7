"""Capture the COW overwrite-merge physical plans into plans/r06/.

``cdc_apply_events``'s apply loop is side-effecting, so the plan evidence
for the r6 COW merge rewrite is captured here on a representative batch:

- cow_merge_before.txt — the r6-start join formulation (batch LWW dedup +
  extract + full-outer join via cdc/apply._merge + the bucket-route
  repartition/sort the writer adds), reconstructed from the same building
  blocks the old path used (all still present: _merge serves coalesce
  mode).
- cow_merge_after.txt  — cdc/fused.fused_cow_merge's union + single route
  exchange + window plan, exactly what write_data_files_prepartitioned
  receives.

Usage: python tools/capture_cow_merge.py
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as E  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from game_library_enrichment_etl_spark.cdc.apply import (  # noqa: E402
    _computed_cols,
    _merge,
    apply_batch,
)
from game_library_enrichment_etl_spark.cdc.fused import fused_cow_merge  # noqa: E402
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table  # noqa: E402
from game_library_enrichment_etl_spark.functions.extract import extract_text_udf  # noqa: E402
from game_library_enrichment_etl_spark.lake.table import (  # noqa: E402
    BUCKET_COL,
    bucket_expr,
    layout_exprs,
    sort_layout,
)
from game_library_enrichment_etl_spark.operators.lww import lww_dedup  # noqa: E402
from game_library_enrichment_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus),
                      app_name="capture-cow-merge")
    outdir = os.path.join(os.path.dirname(__file__), "..", "plans", "r06")
    os.makedirs(outdir, exist_ok=True)

    stream = E._derive_change_stream(spark, sf_dir).withColumn(
        "batch_id", F.pmod(F.col("lsn"), F.lit(2)).cast("bigint")
    )
    root = tempfile.mkdtemp(prefix="icelet_planscow_")
    table = create_pages_table(
        spark, os.path.join(root, "pages"), n_buckets=32, merge_strategy="cow"
    )
    apply_batch(table, stream.where(F.col("batch_id") == 0))
    snap = table.snapshot()
    key, order_cols = "url", ("warc_ts", "lsn")
    batch = stream.where(F.col("batch_id") == 1)
    evo = table.resolve_schema(batch.drop("op", "batch_id").schema, None)
    cur = evo.schema
    computed = _computed_cols(cur.names())
    payload = [f for f in cur.fields if f.name not in computed and f.name != "_deleted"]
    normalized = batch.select(
        F.col("op"), *[F.col(f.name).cast(f.type).alias(f.name) for f in payload]
    )
    target = table.read(buckets=None, include_deleted=True, as_schema=cur)
    touched_rows = sum(f.rows for f in snap.files)

    # -------- before: the join formulation + the writer's repartition/sort
    winners = lww_dedup(normalized, key, order_cols, strategy="agg",
                        unique_versions=True)
    for cname, src_col in computed.items():
        winners = winners.withColumn(
            cname, F.when(F.col("op") != "D", extract_text_udf(F.col(src_col)))
        )
    winners = winners.withColumn(BUCKET_COL, bucket_expr(key, snap.n_buckets))
    out_old = _merge(target, winners, key, order_cols, cur, computed,
                     "overwrite").withColumn(
        BUCKET_COL, bucket_expr(key, snap.n_buckets)
    )
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_parts, n_salts = sort_layout(nparts, snap.n_buckets, touched_rows + 1500)
    repart_cols, _ = layout_exprs(key, n_parts, n_salts)
    staged_old = out_old.repartition(n_parts, *repart_cols).sortWithinPartitions(
        BUCKET_COL, key
    )

    # -------- after: union + single route exchange
    out_new = fused_cow_merge(
        target, normalized, key, "op", order_cols, cur.to_spark(), computed,
        snap.n_buckets, total_rows=touched_rows + 1500,
    )

    for name, df in (("cow_merge_before", staged_old), ("cow_merge_after", out_new)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(name, "written")
    spark.stop()


if __name__ == "__main__":
    main()
