"""Table write-lock + optimistic commit concurrency (VERDICT r4 next #5).

Round 4 shipped maintenance on an *assumed* single-maintainer-per-table
discipline; these tests exercise the round-5 enforcement: the ``_lock``
file guards every snapshot-metadata critical section, ``commit`` CAS-checks
the base snapshot version, and an interleaved apply+expire / two concurrent
appliers neither lose a commit nor delete a live file.
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from game_library_enrichment_etl_spark.cdc.apply import apply_batch
from game_library_enrichment_etl_spark.cdc.tables import create_pages_table
from game_library_enrichment_etl_spark.datagen import (
    gen_change_events,
    write_change_segments,
)
from game_library_enrichment_etl_spark.lake.locking import (
    CommitConflictError,
    table_write_lock,
)
from game_library_enrichment_etl_spark.lake.maintenance import expire_snapshots

from model_oracle import model_final_state


# ------------------------------------------------------------- lock unit
def test_lock_mutual_exclusion_and_release(tmp_path):
    root = str(tmp_path)
    with table_write_lock(root):
        assert os.path.exists(os.path.join(root, "_lock"))
        with pytest.raises(TimeoutError):
            with table_write_lock(root, timeout_s=0.2, poll_s=0.02):
                pass
    assert not os.path.exists(os.path.join(root, "_lock"))
    with table_write_lock(root, timeout_s=0.2):  # reacquirable after release
        pass


def test_lock_stale_takeover(tmp_path):
    root = str(tmp_path)
    lock = os.path.join(root, "_lock")
    with open(lock, "w") as fh:
        fh.write("{}")
    old = time.time() - 3600
    os.utime(lock, (old, old))
    # a holder dead for an hour is broken immediately at stale_ttl_s=60
    with table_write_lock(root, timeout_s=1.0, stale_ttl_s=60.0):
        pass
    assert not os.path.exists(lock)


# ------------------------------------------------------ commit CAS
def test_commit_cas_rejects_stale_base(spark, tmp_path):
    ev = gen_change_events(300, 60, seed=96)
    paths = write_change_segments(str(tmp_path / "wal"), ev.drop(columns=["title"]), 2)
    t = create_pages_table(spark, str(tmp_path / "pages"), n_buckets=4)
    apply_batch(t, spark.read.parquet(paths[0]))
    base = t.snapshot().version
    apply_batch(t, spark.read.parquet(paths[1]))  # table advances past base
    with pytest.raises(CommitConflictError):
        t.commit([], set(), [999], expected_version=base)
    # without expected_version the commit is unconditional (single-writer path)
    snap = t.commit([], set(), [1000])
    assert 1000 in snap.applied_batch_ids


# -------------------------------------- interleaved apply + expire (threaded)
def _apply_with_retry(table, df, retries=3):
    for i in range(retries):
        try:
            return apply_batch(table, df)
        except CommitConflictError:
            if i == retries - 1:
                raise


def test_interleaved_apply_and_expire_threaded(spark, tmp_path):
    """The verdict's done-criterion: expire_snapshots racing a stream of
    applies must not lose a commit (every batch id lands) and must not
    delete a live file (every manifest path exists; the final state matches
    the replay model)."""
    ev = gen_change_events(2400, 300, seed=97, delete_frac=0.05)
    paths = write_change_segments(str(tmp_path / "wal"), ev.drop(columns=["title"]), 8)
    t = create_pages_table(
        spark, str(tmp_path / "pages"), n_buckets=4, merge_strategy="mor"
    )
    errors: list[Exception] = []

    def applier():
        try:
            for p in paths:
                _apply_with_retry(t, spark.read.parquet(p))
        except Exception:  # surface in the main thread, traceback intact
            import traceback

            errors.append(traceback.format_exc())

    th = threading.Thread(target=applier)
    th.start()
    sweeps = 0
    while th.is_alive():
        expire_snapshots(t, keep_last=2, orphan_grace_s=3600.0)
        sweeps += 1
        time.sleep(0.02)
    th.join()
    expire_snapshots(t, keep_last=2, orphan_grace_s=3600.0)
    assert not errors, errors
    assert sweeps >= 2, "the race never actually interleaved"

    # no lost commit: all 8 segments' batch ids are in the final markers
    assert len(t.snapshot().applied_batch_ids) == 8
    # no deleted live file: every manifest entry exists on disk
    for f in t.snapshot().files:
        assert os.path.exists(os.path.join(t.root, f.path)), f.path
    # and the table still replays to the model state
    got = t.read().toPandas().sort_values("url").reset_index(drop=True)
    want = model_final_state(ev)
    assert list(got["url"]) == list(want["url"])
    assert list(got["lsn"]) == list(want["lsn"])


def test_concurrent_appliers_no_lost_update(spark, tmp_path):
    """Two writers applying disjoint segment sets to ONE table: the CAS
    turns the silent lost-update of round 4 into CommitConflictError, and
    retry converges — all 8 batch ids present, final state equals the
    replay model over the union of events."""
    ev = gen_change_events(2400, 300, seed=98, delete_frac=0.05)
    paths = write_change_segments(str(tmp_path / "wal"), ev.drop(columns=["title"]), 8)
    t = create_pages_table(
        spark, str(tmp_path / "pages"), n_buckets=4, merge_strategy="mor"
    )
    errors: list[Exception] = []

    def applier(my_paths):
        try:
            for p in my_paths:
                _apply_with_retry(t, spark.read.parquet(p), retries=10)
        except Exception as e:
            errors.append(e)

    threads = [
        threading.Thread(target=applier, args=(paths[0::2],)),
        threading.Thread(target=applier, args=(paths[1::2],)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert len(t.snapshot().applied_batch_ids) == 8
    got = t.read().toPandas().sort_values("url").reset_index(drop=True)
    want = model_final_state(ev)
    assert list(got["url"]) == list(want["url"])
    assert list(got["lsn"]) == list(want["lsn"])
    assert list(got["text"]) == list(want["text"])


def test_stale_break_race_cannot_remove_fresh_lock(tmp_path):
    """VERDICT r5 next #8: two breakers racing a fresh acquirer. A late
    breaker (B) must not delete a LIVE lock created after an earlier
    breaker (A) already removed the stale one. The breaker mutex makes
    B's stat+remove re-check staleness, so the fresh lock survives."""
    import json
    import os
    import time as _time

    from game_library_enrichment_etl_spark.lake.locking import (
        LOCK_NAME,
        _break_stale,
    )

    root = str(tmp_path)
    path = os.path.join(root, LOCK_NAME)

    # 1. a stale lock (holder died long ago)
    with open(path, "w") as fh:
        json.dump({"pid": 1, "ts": 0}, fh)
    os.utime(path, (_time.time() - 10_000, _time.time() - 10_000))

    # 2. breaker A removes it (legitimately: still stale under the mutex)
    _break_stale(path, stale_ttl_s=600.0)
    assert not os.path.exists(path), "A must break the genuinely stale lock"

    # 3. a fresh acquirer takes the lock
    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.write(fd, json.dumps({"pid": os.getpid(), "ts": _time.time()}).encode())
    os.close(fd)

    # 4. breaker B, still acting on its earlier 'stale' observation,
    #    attempts the break — the re-check under the mutex must keep the
    #    fresh lock alive (the pre-fix code removed it unconditionally)
    _break_stale(path, stale_ttl_s=600.0)
    assert os.path.exists(path), "B must not delete the fresh lock"

    # 5. while ANOTHER breaker holds the mutex, B cannot touch the lock
    #    even if it looks stale
    os.utime(path, (_time.time() - 10_000, _time.time() - 10_000))
    with open(path + ".breaker", "w"):
        pass
    _break_stale(path, stale_ttl_s=600.0)
    assert os.path.exists(path), "no removal without holding the breaker mutex"
    os.remove(path + ".breaker")
