"""Lake maintenance: small-file compaction + tombstone expiry.

COW merges leave one file per (touched bucket, commit); over many batches a
bucket accumulates at most one live file (each merge rewrites the whole
bucket), but buckets *untouched* for long stretches keep old-schema files
and deleted rows keep tombstones forever. ``compact`` rewrites selected
buckets: merges files, re-projects to the current schema (retiring old
schema_versions), and drops tombstones whose version is at or below the
event-time watermark (safe: any event that could still arrive for that key
would be late-dropped anyway).

Runs as a normal commit: snapshot isolation, atomic pointer swap, no
change to ``applied_batch_ids`` (idempotence markers survive compaction).

Reference precursor: the ``full_run`` destructive rebuild
(/root/reference/src/how_long_to_beat.py:150-151) — re-expressed as an
incremental, non-destructive table service.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .table import BUCKET_COL, DELETED_COL, IceletTable, bucket_expr


def maybe_compact(
    table: IceletTable,
    max_files_per_bucket: int = 8,
    expire_tombstones: bool = True,
) -> dict | None:
    """Auto-compaction trigger for merge-on-read: compact exactly the
    buckets whose delta-file count exceeds ``max_files_per_bucket``.

    MOR appends one delta file per bucket per batch (more with write
    salting), so a sustained 10^10-event stream would otherwise accumulate
    per-bucket read amplification without bound (round-2 bench: post-apply
    read 32x slower than COW after only 8 batches). Calling this after
    every applied batch bounds files-per-bucket — and therefore read-time
    LWW resolution work — at ~threshold, while amortizing the rewrite: a
    bucket is rewritten every ``threshold`` batches instead of every batch
    (COW), keeping the O(batch) apply cost for threshold-1 of every
    threshold batches.

    Returns compact()'s metrics when triggered, None otherwise (the check
    itself is manifest-only — no Spark job, no file I/O)."""
    snap = table.snapshot()
    counts: dict[int, int] = {}
    for f in snap.files:
        counts[f.bucket] = counts.get(f.bucket, 0) + 1
    todo = sorted(b for b, c in counts.items() if c > max_files_per_bucket)
    if not todo:
        return None
    return compact(table, buckets=todo, expire_tombstones=expire_tombstones)


def compact(
    table: IceletTable,
    buckets: list[int] | None = None,
    expire_tombstones: bool = True,
) -> dict:
    """Compact ``buckets`` (default: all buckets that have any file).

    Returns metrics: buckets compacted, rows before/after, tombstones
    expired (estimated from manifest row counts).
    """
    snap = table.snapshot()
    ts_col, lsn_col = snap.properties["version_cols"]
    wm_us = snap.properties.get("watermark_us")

    present = sorted({f.bucket for f in snap.files})
    todo = present if buckets is None else [b for b in buckets if b in present]
    if not todo:
        return {"buckets": 0, "rows_before": 0, "rows_after": 0}

    rows_before = sum(f.rows for f in snap.files if f.bucket in set(todo))
    df = table.read(buckets=todo, include_deleted=True)
    if expire_tombstones and wm_us is not None:
        # STRICTLY below the watermark: apply_batch's late-drop predicate is
        # ts < watermark (apply.py), so an event AT the watermark can still
        # arrive — a tombstone with ts == watermark must survive expiry or a
        # replayed stale event at the boundary would resurrect the row.
        dead = F.coalesce(F.col(DELETED_COL), F.lit(False)) & (
            F.col(ts_col) < F.timestamp_micros(F.lit(int(wm_us)))
        )
        df = df.where(~dead)
    elif expire_tombstones and wm_us is None:
        # no watermark tracked -> expiring any tombstone would let stale
        # replays resurrect rows; keep them all
        pass

    out = df.withColumn(BUCKET_COL, bucket_expr(table.key_col, snap.n_buckets))
    files = table.write_data_files(out, snap.version + 1, snap.schema.version)
    new_snap = table.commit(files, set(todo), [], new_schema=None)
    rows_after = sum(f.rows for f in files)
    return {
        "buckets": len(todo),
        "rows_before": int(rows_before),
        "rows_after": int(rows_after),
        "tombstones_expired": int(rows_before - rows_after),
        "snapshot_version": new_snap.version,
    }
