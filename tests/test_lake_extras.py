"""Lake-layer extras: python/Spark xxhash parity, pruned point lookup,
key-range pruning, crash-safe pointer semantics."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from game_library_enrichment_etl_spark.cdc.apply import apply_batch
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table
from game_library_enrichment_etl_spark.datagen import gen_change_events, write_change_segments
from game_library_enrichment_etl_spark.lake.snapshot import read_snapshot, swing_pointer
from game_library_enrichment_etl_spark.lake.xxhash import bucket_of, xxhash64


def test_xxhash_matches_spark(spark):
    vals = ["", "a", "https://x/y", "ü☃", "p" * 63, "q" * 200]
    rows = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], ["s"])
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    for v in vals:
        assert rows[v] == xxhash64(v.encode("utf-8"))


def _build(spark, tmp_path, seed=41):
    ev = gen_change_events(1000, 200, seed=seed)
    paths = write_change_segments(str(tmp_path / "wal"), ev.drop(columns=["title"]), 2)
    t = create_pages_table(spark, str(tmp_path / "pages"), n_buckets=8)
    for p in paths:
        apply_batch(t, spark.read.parquet(p))
    return t, ev


def test_point_lookup_prunes_to_one_bucket(spark, tmp_path):
    t, ev = _build(spark, tmp_path)
    live = t.read().select("url", "lsn").toPandas()
    url = live["url"].iloc[0]
    got = t.lookup(url).toPandas()
    assert len(got) == 1 and got["lsn"].iloc[0] == live[live.url == url]["lsn"].iloc[0]
    # the scan reads only the one bucket's files
    files = t.lookup(url).inputFiles()
    b = bucket_of(url, t.snapshot().n_buckets)
    assert files and all(f"_bucket={b}" in f for f in files)
    # missing key -> empty, still pruned
    assert t.lookup("https://nope.example.com/").count() == 0


def test_crash_before_pointer_swap_invisible(spark, tmp_path):
    """Data+snapshot written but pointer not swapped == commit invisible;
    swinging the pointer completes it (the commit protocol's crash story)."""
    t, ev = _build(spark, tmp_path, seed=42)
    v = t.snapshot().version
    rows_v = t.read().count()
    # simulate: next snapshot file exists but pointer still points at v
    snap = t.snapshot()
    import json

    fake = snap.to_json()
    fake["version"] = v + 1
    fake["parent"] = v
    with open(os.path.join(t.root, "snapshots", f"v{v+1}.json"), "w") as fh:
        json.dump(fake, fh)
    # pointer untouched -> current is still v
    assert read_snapshot(t.root).version == v
    assert t.read().count() == rows_v
    # completing the swap publishes it atomically
    swing_pointer(t.root, v + 1)
    assert read_snapshot(t.root).version == v + 1
