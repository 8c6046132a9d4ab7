"""Source operators: csv scan, raw landings, retry-bounded enrichment."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from game_library_enrichment_etl_spark.sources.readers import (
    JobConfig,
    csv_scan,
    enrich_with_retry,
    latest_landing,
    raw_landing,
    read_change_batch,
    split_target_bytes,
)


def test_csv_scan_with_rename(spark, tmp_path):
    p = tmp_path / "lib.csv"
    p.write_text("Name,Release Date\nHalo,2001-11-15\nMyst,1993-09-24\n")
    schema = T.StructType(
        [T.StructField("Name", T.StringType()), T.StructField("Release Date", T.StringType())]
    )
    df = csv_scan(spark, str(p), schema=schema, rename={"Name": "name", "Release Date": "release_date"})
    assert df.columns == ["name", "release_date"]
    assert df.count() == 2


def test_raw_landing_immutable_and_latest(spark, tmp_path):
    df = spark.range(5).select(F.col("id"))
    base = str(tmp_path / "raw")
    p1 = raw_landing(df, base, "2024-01-01T000000")
    p2 = raw_landing(df, base, "2024-01-02T000000")
    assert latest_landing(base) == p2
    # write-once: same landing path refuses overwrite
    with pytest.raises(Exception):
        raw_landing(df, base, "2024-01-02T000000")


def test_enrich_with_retry_vectorized(spark):
    calls = {"n": 0}

    def flaky_lookup(k: str) -> dict | None:
        # fails on first attempt for even keys; returns None for key '3'
        calls["n"] += 1
        if k == "3":
            return None
        if int(k) % 2 == 0 and calls.setdefault(f"seen{k}", 0) == 0:
            calls[f"seen{k}"] = 1
            raise RuntimeError("transient")
        return {"hours": float(k) * 2.0, "label": f"game-{k}"}

    df = spark.createDataFrame([(str(i),) for i in range(6)], ["key"])
    out = enrich_with_retry(
        df, "key", flaky_lookup, [("hours", "double"), ("label", "string")], attempts=2
    ).toPandas().sort_values("key").reset_index(drop=True)
    assert out.loc[out.key == "4", "hours"].iloc[0] == 8.0
    assert pd.isna(out.loc[out.key == "3", "hours"].iloc[0])
    assert out.loc[out.key == "1", "label"].iloc[0] == "game-1"


def test_job_config(tmp_path):
    cfg = JobConfig(
        table_root=str(tmp_path / "t" / "pages"),
        wal_dir=str(tmp_path / "wal"),
        checkpoint_dir=str(tmp_path / "cp"),
    )
    cfg.ensure_dirs()
    import os

    assert os.path.isdir(cfg.wal_dir) and os.path.isdir(cfg.checkpoint_dir)


def test_split_target_bytes_bounds():
    mb = 1 << 20
    # small batch on a big cluster: splits shrink so the scan can use the
    # slots twice over (~2 waves; the 120MB/8-slot case that pinned every
    # per-batch map stage to 2 tasks on the scaling harness)
    assert split_target_bytes(120 * mb, 8) == 7 * mb + (mb // 2)
    # 100TB design point: total/(2*parallelism) >> 128MB -> default preserved
    assert split_target_bytes(100 * (1 << 40), 4000) == 128 * mb
    # floor: never below 4MB even for tiny batches (split overhead)
    assert split_target_bytes(1 * mb, 32) == 4 * mb
    # degenerate parallelism
    assert split_target_bytes(64 * mb, 0) == 32 * mb


def test_read_change_batch_sets_split_conf(spark, tmp_path):
    seg = str(tmp_path / "seg-0")
    spark.range(0, 10_000).withColumn("v", F.col("id") * 2).repartition(
        4
    ).write.parquet(seg)
    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        df = read_change_batch(spark, seg)
        assert df.count() == 10_000
        total = sum(
            f.stat().st_size
            for f in (tmp_path / "seg-0").iterdir()
            if f.name.endswith(".parquet")
        )
        par = spark.sparkContext.defaultParallelism
        expect = split_target_bytes(total, par)
        assert int(spark.conf.get("spark.sql.files.maxPartitionBytes")) == expect
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)
