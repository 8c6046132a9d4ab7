"""IceletTable — a from-scratch Iceberg-style lake table over plain parquet.

Capabilities (the subset the engine needs; SURVEY.md §4 custom 1-5):
- hash-bucketed layout by key: ``_bucket = pmod(xxhash64(key), n_buckets)``
  so a MERGE only rewrites the buckets its batch touches (copy-on-write
  file pruning via per-file key bounds + bucket ids in the manifest);
- snapshot isolation + time travel (read any committed version);
- field-id schema evolution: add / rename / type-widen without rewriting
  data files — old files are re-projected by field id on read;
- atomic commits via pointer rename; idempotent batch-id markers.

No Iceberg jar exists in this sandbox (/opt/spark/jars has none) — this
layer is the from-scratch answer, with an interface seam (same verbs:
read / merge-commit / snapshot) so a real Iceberg catalog could slot in.
"""

from __future__ import annotations

import os
from functools import reduce

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import TableSchema, evolve
from .snapshot import (
    DataFileMeta,
    Snapshot,
    read_snapshot,
    write_snapshot,
)

BUCKET_COL = "_bucket"
DELETED_COL = "_deleted"


def bucket_expr(key_col: str, n_buckets: int):
    """Deterministic bucket id for a key — the explicit repartition target
    (north_rule: explicit partitioning by hash(url))."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


class IceletTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------- lifecycle
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: T.StructType | TableSchema,
        key_col: str = "url",
        version_cols: tuple[str, str] = ("warc_ts", "lsn"),
        n_buckets: int = 16,
        properties: dict | None = None,
    ) -> "IceletTable":
        if read_snapshot(root) is not None:
            raise FileExistsError(f"table already exists at {root}")
        tschema = (
            schema if isinstance(schema, TableSchema) else TableSchema.from_spark(schema, 0)
        )
        props = {"key": key_col, "version_cols": list(version_cols)}
        props.update(properties or {})
        snap = Snapshot(
            version=0, parent=None, n_buckets=n_buckets, schemas=[tschema], files=[],
            applied_batch_ids=[], properties=props,
        )
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        write_snapshot(root, snap)
        return IceletTable(spark, root)

    @staticmethod
    def exists(root: str) -> bool:
        return read_snapshot(root) is not None

    def snapshot(self, version: int | None = None) -> Snapshot:
        snap = read_snapshot(self.root, version)
        if snap is None:
            raise FileNotFoundError(f"no icelet table at {self.root}")
        return snap

    @property
    def key_col(self) -> str:
        return self.snapshot().properties["key"]

    # ------------------------------------------------------------------ read
    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        key_range: tuple[str, str] | None = None,
        include_deleted: bool = False,
        as_schema: "TableSchema | None" = None,
    ) -> DataFrame:
        """Read the table at a snapshot (time travel), optionally pruned to a
        bucket set and/or key range using manifest stats — no file listing,
        no footer reads for skipped files. Tombstone rows (``_deleted``)
        are filtered out unless ``include_deleted``. ``as_schema`` projects
        to a not-yet-committed evolved schema (fields matched by id; new
        fields read as null) — used by the merge when the incoming batch
        evolves the schema."""
        snap = self.snapshot(version)
        cur = as_schema if as_schema is not None else snap.schema
        files = snap.files
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f.bucket in bset]
        if key_range is not None:
            lo, hi = key_range
            files = [
                f
                for f in files
                if f.min_key is None or not (f.max_key < lo or f.min_key > hi)
            ]
        if not files:
            empty = self.spark.createDataFrame([], cur.to_spark())
            if DELETED_COL in cur.names() and not include_deleted:
                empty = empty.drop(DELETED_COL)
            return empty

        # group files by the schema version they were written under and
        # re-project by field id (rename/widen are metadata-only).
        by_sv: dict[int, list[str]] = {}
        for f in files:
            by_sv.setdefault(f.schema_version, []).append(os.path.join(self.root, f.path))
        parts = []
        cur_by_id = {f.id: f for f in cur.fields}
        for sv, paths in by_sv.items():
            old = snap.schema_at(sv)
            df = self.spark.read.schema(old.to_spark()).parquet(*paths)
            cols = []
            old_by_id = old.by_id()
            for cf in cur.fields:
                of = old_by_id.get(cf.id)
                if of is None:  # column added after these files were written
                    cols.append(F.lit(None).cast(cf.type).alias(cf.name))
                else:
                    cols.append(F.col(of.name).cast(cf.type).alias(cf.name))
            parts.append(df.select(*cols))
        out = reduce(lambda a, b: a.unionByName(b), parts)
        if DELETED_COL in cur.names() and not include_deleted:
            out = out.where(~F.coalesce(F.col(DELETED_COL), F.lit(False))).drop(DELETED_COL)
        return out

    def lookup(self, key_value: str, version: int | None = None) -> DataFrame:
        """Point lookup: prune to the key's single bucket via the pure-Python
        XXH64 (no Spark job for planning) + manifest key bounds, then filter.
        Reads at most one bucket's files; the parquet scan gets the pushed
        EqualTo filter for row-group skipping."""
        from .xxhash import bucket_of

        snap = self.snapshot(version)
        b = bucket_of(key_value, snap.n_buckets)
        df = self.read(version=version, buckets=[b], key_range=(key_value, key_value))
        return df.where(F.col(self.key_col) == key_value)

    # ----------------------------------------------------------------- write
    def write_data_files(
        self, df: DataFrame, version: int, schema_version: int
    ) -> list[DataFileMeta]:
        """Write ``df`` (current-schema columns + ``_bucket``) as immutable
        per-bucket parquet files under data/v{version}; return their manifest
        entries with key bounds harvested from parquet footers (no data scan).
        """
        key = self.key_col
        rel_dir = os.path.join("data", f"v{version}")
        out = os.path.join(self.root, rel_dir)
        # hash-repartition on _bucket => each bucket's rows land in exactly
        # one task => exactly one file per touched bucket (no tiny files).
        nparts = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        (
            df.repartition(nparts, BUCKET_COL)
            .write.mode("errorifexists")
            .partitionBy(BUCKET_COL)
            .parquet(out)
        )
        metas: list[DataFileMeta] = []
        for entry in sorted(os.listdir(out)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            bucket = int(entry.split("=")[1])
            bdir = os.path.join(out, entry)
            for fn in sorted(os.listdir(bdir)):
                if not fn.endswith(".parquet"):
                    continue
                fpath = os.path.join(bdir, fn)
                rows, kmin, kmax = _footer_stats(fpath, key)
                metas.append(
                    DataFileMeta(
                        path=os.path.relpath(fpath, self.root),
                        bucket=bucket,
                        rows=rows,
                        min_key=kmin,
                        max_key=kmax,
                        schema_version=schema_version,
                    )
                )
        return metas

    def commit(
        self,
        new_files: list[DataFileMeta],
        replaced_buckets: set[int],
        batch_ids: list[int],
        new_schema: TableSchema | None = None,
        properties_update: dict | None = None,
    ) -> Snapshot:
        """Build + atomically publish the next snapshot: files of untouched
        buckets carry forward; touched buckets are fully replaced by
        ``new_files`` (copy-on-write)."""
        snap = self.snapshot()
        kept = [f for f in snap.files if f.bucket not in replaced_buckets]
        schemas = list(snap.schemas)
        if new_schema is not None and new_schema.version != snap.schema.version:
            schemas.append(new_schema)
        props = dict(snap.properties)
        props.update(properties_update or {})
        new_snap = Snapshot(
            version=snap.version + 1,
            parent=snap.version,
            n_buckets=snap.n_buckets,
            schemas=schemas,
            files=kept + new_files,
            applied_batch_ids=sorted(set(snap.applied_batch_ids) | set(batch_ids)),
            properties=props,
        )
        write_snapshot(self.root, new_snap)
        return new_snap

    # ------------------------------------------------------------- evolution
    def resolve_schema(
        self, incoming: T.StructType, rename_hints: dict[str, str] | None = None
    ):
        return evolve(self.snapshot().schema, incoming, rename_hints)


def _footer_stats(path: str, key: str) -> tuple[int, str | None, str | None]:
    """rows + min/max of the key column from parquet footer metadata only."""
    md = pq.ParquetFile(path).metadata
    kmin = kmax = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            if col.path_in_schema != key:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn = mn.decode("utf-8", "replace")
            if isinstance(mx, bytes):
                mx = mx.decode("utf-8", "replace")
            kmin = mn if kmin is None else min(kmin, mn)
            kmax = mx if kmax is None else max(kmax, mx)
    return md.num_rows, kmin, kmax
