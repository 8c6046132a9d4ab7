"""Checkpoint-resume / exactly-once suite (SURVEY.md §5.4, north_rule):
kill mid-stream after a table commit, restart, assert no dup / no loss."""

from __future__ import annotations

import pandas as pd

from game_library_enrichment_etl_spark.cdc.apply import apply_batch, read_lineage
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table
from game_library_enrichment_etl_spark.datagen import gen_change_events, write_change_segments
from game_library_enrichment_etl_spark.streaming.runner import run_stream, tail_segments

from model_oracle import model_final_state

N_EVENTS, N_URLS, N_SEG = 1500, 200, 5


def _mkstream(tmp_path, seed=21):
    ev = gen_change_events(N_EVENTS, N_URLS, seed=seed)
    paths = write_change_segments(str(tmp_path / "wal"), ev.drop(columns=["title"]), N_SEG)
    return ev, paths


def _assert_matches_model(table, ev):
    got = table.read().toPandas().sort_values("url").reset_index(drop=True)
    want = model_final_state(ev)
    assert list(got["url"]) == list(want["url"])
    assert list(got["lsn"]) == list(want["lsn"])
    assert list(got["text"]) == list(want["text"])


def test_stream_end_to_end(spark, tmp_path):
    ev, paths = _mkstream(tmp_path)
    table = create_pages_table(spark, str(tmp_path / "pages"), n_buckets=8)
    results = run_stream(table, str(tmp_path / "wal"), str(tmp_path / "cp"))
    assert len([r for r in results if not r.skipped]) == N_SEG
    _assert_matches_model(table, ev)


def test_kill_after_commit_then_resume(spark, tmp_path):
    """Crash in the worst window (table committed, checkpoint not): restart
    redelivers the segment; markers make the re-apply a no-op."""
    ev, paths = _mkstream(tmp_path, seed=22)
    table = create_pages_table(spark, str(tmp_path / "pages"), n_buckets=8)

    first = run_stream(
        table, str(tmp_path / "wal"), str(tmp_path / "cp"), fail_after_batches=2
    )
    assert len([r for r in first if not r.skipped]) == 2
    v_mid = table.snapshot().version

    second = run_stream(table, str(tmp_path / "wal"), str(tmp_path / "cp"))
    # redelivered segment(s) are skipped; the rest apply exactly once
    applied_ids = table.snapshot().applied_batch_ids
    assert applied_ids == list(range(N_SEG))
    _assert_matches_model(table, ev)

    # lineage has exactly one row per segment — no duplicate applies
    lin = read_lineage(spark, table.root).toPandas()
    assert sorted(lin["batch_id"]) == list(range(N_SEG))
    assert lin["events_in"].sum() == N_EVENTS


def test_manual_apply_then_stream_skips_marker(spark, tmp_path):
    """A segment applied out-of-band is not re-applied by the stream."""
    ev, paths = _mkstream(tmp_path, seed=23)
    table = create_pages_table(spark, str(tmp_path / "pages"), n_buckets=8)
    apply_batch(table, spark.read.parquet(paths[0]))
    results = run_stream(table, str(tmp_path / "wal"), str(tmp_path / "cp"))
    skipped = [r for r in results if r.skipped]
    assert len(skipped) == 1
    _assert_matches_model(table, ev)


def test_tail_segments_idempotent(spark, tmp_path):
    ev, paths = _mkstream(tmp_path, seed=24)
    table = create_pages_table(spark, str(tmp_path / "pages"), n_buckets=8)
    r1 = tail_segments(table, str(tmp_path / "wal"))
    assert len([r for r in r1 if not r.skipped]) == N_SEG
    r2 = tail_segments(table, str(tmp_path / "wal"))
    assert all(r.skipped for r in r2)
    _assert_matches_model(table, ev)


def test_late_events_dropped_and_counted(spark, tmp_path):
    """With a lateness bound, events behind the watermark are dropped and
    counted in lineage (north_star: late arrivals dropped past watermark)."""
    ev = gen_change_events(1500, 200, seed=25, late_frac=0.1, late_by_s=100_000)
    paths = write_change_segments(str(tmp_path / "wal"), ev.drop(columns=["title"]), 5)
    table = create_pages_table(spark, str(tmp_path / "pages"), n_buckets=8)
    tail_segments(table, str(tmp_path / "wal"), lateness_s=600)
    lin = read_lineage(spark, table.root).toPandas()
    assert lin["late_dropped"].sum() > 0
    # watermark advanced monotonically in snapshot properties
    assert table.snapshot().properties.get("watermark_us") is not None
