"""Snapshot + manifest metadata for the icelet table format.

An icelet table directory:

    table_root/
      data/v{N}-{uuid}/_bucket={K}/part-*.parquet  # immutable data files per commit attempt
      snapshots/v{N}.json                    # snapshot (manifest inlined)
      _current                               # pointer file: name of live snapshot

Commit protocol (SURVEY.md §4 custom-4; reference precursor: latest-file
discovery + keyed upsert, /root/reference/src/how_long_to_beat.py:287-296,236-244):
write data files -> write snapshot JSON -> atomically rename a temp pointer
over ``_current``. A crash before the pointer swap leaves orphan files that
no snapshot references — the pointer is the single source of truth.

Exactly-once: each snapshot carries ``applied_batch_ids``; re-applying an
already-recorded batch id is a no-op (idempotent commit markers,
BASELINE.json north_star).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from .schema import TableSchema

FORMAT_VERSION = 1


@dataclass
class DataFileMeta:
    """One immutable parquet data file + its pruning stats.

    ``min_key``/``max_key`` are the per-file key bounds used for
    merge file-pruning (SURVEY.md §4 custom-3 — the Iceberg-manifest
    subset we reimplement because no Iceberg jar is bundled).

    ``sequence`` is the commit sequence number the file was written at
    (Iceberg v2's data sequence number): under merge-on-read, rows with
    equal (warc_ts, lsn) versions resolve to the later-committed file,
    matching copy-on-write's "source wins on version tie" rule.
    """

    path: str  # relative to table_root
    bucket: int
    rows: int
    min_key: str | None
    max_key: str | None
    schema_version: int
    sequence: int = 0

    def to_json(self) -> dict:
        return {
            "path": self.path,
            "bucket": self.bucket,
            "rows": self.rows,
            "min_key": self.min_key,
            "max_key": self.max_key,
            "schema_version": self.schema_version,
            "sequence": self.sequence,
        }

    @staticmethod
    def from_json(d: dict) -> "DataFileMeta":
        return DataFileMeta(
            d["path"], d["bucket"], d["rows"], d.get("min_key"), d.get("max_key"),
            d["schema_version"], d.get("sequence", 0),
        )


@dataclass
class Snapshot:
    version: int
    parent: int | None
    n_buckets: int
    schemas: list[TableSchema]  # full history; last = current
    files: list[DataFileMeta] = field(default_factory=list)
    applied_batch_ids: list[int] = field(default_factory=list)
    properties: dict = field(default_factory=dict)

    @property
    def schema(self) -> TableSchema:
        return self.schemas[-1]

    def schema_at(self, version: int) -> TableSchema:
        for s in self.schemas:
            if s.version == version:
                return s
        raise KeyError(f"no schema version {version}")

    def total_rows(self) -> int:
        return sum(f.rows for f in self.files)

    def to_json(self) -> dict:
        return {
            "format_version": FORMAT_VERSION,
            "version": self.version,
            "parent": self.parent,
            "n_buckets": self.n_buckets,
            "schemas": [s.to_json() for s in self.schemas],
            "files": [f.to_json() for f in self.files],
            "applied_batch_ids": self.applied_batch_ids,
            "properties": self.properties,
        }

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(
            version=d["version"],
            parent=d.get("parent"),
            n_buckets=d["n_buckets"],
            schemas=[TableSchema.from_json(s) for s in d["schemas"]],
            files=[DataFileMeta.from_json(f) for f in d["files"]],
            applied_batch_ids=list(d.get("applied_batch_ids", [])),
            properties=dict(d.get("properties", {})),
        )


def snapshot_path(root: str, version: int) -> str:
    return os.path.join(root, "snapshots", f"v{version}.json")


def write_snapshot(root: str, snap: Snapshot) -> str:
    """Write snapshot JSON then atomically swing the ``_current`` pointer."""
    os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
    path = snapshot_path(root, snap.version)
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(snap.to_json(), fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, path)
    swing_pointer(root, snap.version)
    return path


def swing_pointer(root: str, version: int) -> None:
    ptr_tmp = os.path.join(root, f"_current.tmp-{uuid.uuid4().hex[:8]}")
    with open(ptr_tmp, "w") as fh:
        fh.write(f"v{version}.json")
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(ptr_tmp, os.path.join(root, "_current"))  # atomic on POSIX


def read_current_version(root: str) -> int | None:
    ptr = os.path.join(root, "_current")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        name = fh.read().strip()
    return int(name[1:].split(".")[0])


def read_snapshot(root: str, version: int | None = None) -> Snapshot | None:
    if version is None:
        version = read_current_version(root)
        if version is None:
            return None
    with open(snapshot_path(root, version)) as fh:
        return Snapshot.from_json(json.load(fh))
