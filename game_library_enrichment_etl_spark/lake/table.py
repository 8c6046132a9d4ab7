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
import threading
import uuid
from functools import lru_cache, reduce

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

# spark.sql.maxConcurrentOutputFileWriters is a session-global SQL conf with
# no per-write DataFrameWriter option; the set/write/restore window is
# guarded so a concurrent apply/compaction sharing the SparkSession can
# neither observe nor clobber the temporary value.
_WRITER_CONF_LOCK = threading.Lock()


def bucket_expr(key_col: str, n_buckets: int):
    """Deterministic bucket id for a key — the explicit repartition target
    (north_rule: explicit partitioning by hash(url))."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


# every writer stages a commit's files under data/v{sequence}-{uuid8}/
# (write_data_files / write_data_files_prepartitioned); the read path
# exploits that to derive _seq from the file path instead of planning one
# scan branch per sequence — after verifying the invariant per file
_COMMIT_DIR_RE = __import__("re").compile(r"^v(\d+)-[0-9a-f]{8}$")


def _path_sequence(rel_path: str) -> int | None:
    """Commit sequence encoded in a manifest-relative data file path
    (``data/v{seq}-{uuid8}/_bucket=K/...``), or None if the path does not
    follow the standard layout."""
    parts = rel_path.replace("\\", "/").split("/")
    if len(parts) >= 2 and parts[0] == "data":
        m = _COMMIT_DIR_RE.match(parts[1])
        if m is not None:
            return int(m.group(1))
    return None


def _seq_from_file_path():
    """Row-level _seq: parse the commit directory out of the scanned file's
    absolute URI. The LAST ``/data/v{seq}-{uuid8}/`` occurrence is taken so
    a table root that itself contains a look-alike component cannot
    mis-parse (the manifest-relative suffix always supplies one match)."""
    hits = F.regexp_extract_all(
        F.input_file_name(), F.lit(r"/data/v(\d+)-[0-9a-f]{8}/"), F.lit(1)
    )
    return F.element_at(hits, -1).cast("long")


# sort shards are kept at/under this many rows so partition-local sorts of
# multi-KB payload rows stay in memory instead of external-sorting; tuned
# for web-page rows (~1-4 KB) against multi-GB task memory — override per
# call where payloads differ
ROWS_PER_SORT_SHARD = 250_000
# layout granularity (see sort_layout): never shard finer than this many
# rows, target ~TASK_WAVES tasks per slot, and keep at least
# GROUPS_PER_PARTITION distinct (bucket, salt) hash groups per exchange
# partition so balls-in-bins variance stays bounded. Deployment-tunable
# via env (each task carries a fixed cost — python worker checkout, arrow
# stream setup, parquet file init — measured ~0.3s on the bench host, so
# waves trade straggler absorption against per-task overhead).
MIN_ROWS_PER_SHARD = int(os.environ.get("ICELET_MIN_ROWS_PER_SHARD", "25000"))
TASK_WAVES = int(os.environ.get("ICELET_TASK_WAVES", "2"))
GROUPS_PER_PARTITION = int(os.environ.get("ICELET_GROUPS_PER_PARTITION", "8"))
# latency-regime refinement (see sort_layout): minimum rows per task when
# splitting a small batch across extra same-salt partitions
MIN_ROWS_PER_TASK = int(os.environ.get("ICELET_MIN_ROWS_PER_TASK", "3000"))


def sort_layout(
    nparts: int,
    n_buckets: int,
    total_rows: int | None = None,
    rows_per_shard: int = ROWS_PER_SORT_SHARD,
) -> tuple[int, int]:
    """(exchange partitions, in-bucket salts) for a bucket-clustered SORT
    stage (the fused write, the window read-resolve, fused compaction).

    Constraints, resolved together:
    - PARTITION COUNT bounds each task's sorter: sorting happens per
      exchange partition, so with only spark.sql.shuffle.partitions
      partitions a low-parallelism run funnels millions of multi-KB
      payload rows into one task's sorter and external-sorts (measured:
      8M-event 4-bucket compaction at local[2] went 24x super-linear).
      The exchange is therefore sized so a partition holds
      ~rows_per_shard rows. Extra partitions beyond the core count just
      queue — cheap; partitions beyond memory spill — ruinous.
    - TASK WAVES absorb stragglers: a stage with exactly one task per
      slot (the r5 8M bench planned 8 merge tasks on 8 slots) makes the
      stage wall equal its slowest task — every event-log profile showed
      max_task == stage_wall. Targeting ~TASK_WAVES tasks per slot lets
      the scheduler pack around an oversized partition, bounded below by
      the spill constraint and above by MIN_ROWS_PER_SHARD (tiny batches
      should not fan into confetti tasks).
    - SALT COUNT gives the exchange enough distinct hash groups. A
      (bucket, salt) group is one hash unit; hashing G groups into P
      partitions is balls-in-bins, so G must exceed P by a factor
      (GROUPS_PER_PARTITION) or some partitions draw 2-3x the mean
      (measured: 32 buckets into 24 partitions gave a 2.7x straggler).
      When n_buckets alone is fine-grained enough — the 100-TB deployment
      shape, where buckets far outnumber per-stage partitions — the salt
      collapses to 1 and files-per-bucket stays minimal.

    An explicit repartition(N, exprs) yields hashpartitioning(exprs, N),
    which satisfies a window's clustering requirement over the same exprs
    — no second exchange is planned — and AQE never coalesces an
    explicitly-numbered repartition, so the layout holds as planned."""
    n_parts = nparts
    if total_rows:
        by_spill = -(-total_rows // rows_per_shard)  # ceil: sorter bound
        fine_cap = max(1, -(-total_rows // MIN_ROWS_PER_SHARD))
        n_parts = max(by_spill, min(TASK_WAVES * nparts, fine_cap))
        # Latency-regime refinement (r6, measured): a bucketed write emits
        # one file per (bucket, salt) group regardless of n_parts, and a
        # task's fixed cost is dominated by its per-file inits (open /
        # footer / close / rename ~15ms each locally) — a small batch
        # funneled into ONE task writes all n_buckets files serially
        # (0.86s measured for 32 files at 12.5k rows) while 31 cores
        # idle. Extra partitions that keep the SALT COUNT unchanged are
        # free parallelism: same groups, same file count, same layout —
        # just fewer files per task (0.51s at 4 tasks, same 32 files).
        # Bounded by MIN_ROWS_PER_TASK rows per task so confetti stays
        # out, and by the largest partition count whose salt formula
        # still yields the same n_salts, so file counts (and read/
        # compaction amplification) are provably unchanged at any scale.
        if n_parts < TASK_WAVES * nparts and total_rows > MIN_ROWS_PER_TASK:
            salt_now = max(
                1, -(-GROUPS_PER_PARTITION * n_parts // max(n_buckets, 1))
            )
            same_salt_cap = max(
                n_parts, salt_now * max(n_buckets, 1) // GROUPS_PER_PARTITION
            )
            by_task_grain = total_rows // MIN_ROWS_PER_TASK
            n_parts = max(
                n_parts,
                min(by_task_grain, same_salt_cap, TASK_WAVES * nparts),
            )
    n_salts = max(1, -(-GROUPS_PER_PARTITION * n_parts // max(n_buckets, 1)))
    return n_parts, n_salts


def in_bucket_salt(key_col: str, n_salts: int):
    """In-bucket write-salt shard for a key — a pure key function (so the
    colocation invariant and one-file-per-key-per-commit both hold), drawn
    from a hash INDEPENDENT of the bucket hash: seeding xxhash64 with a
    literal decorrelates it from ``pmod(xxhash64(key), n_buckets)``. A
    salt taken from the same hash value collapses to one shard per bucket
    whenever n_salts divides n_buckets (the typical power-of-two case),
    silently re-capping write parallelism at n_buckets."""
    return F.pmod(F.xxhash64(F.lit("_salt"), F.col(key_col)), F.lit(n_salts))


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """Murmur3 x86_32 of one 4-byte int block — bit-identical to Spark's
    ``Murmur3Hash`` (and ``F.hash``) over an IntegerType column (public
    algorithm; Spark hashes an int as a single block with seed 42).
    Returns the SIGNED 32-bit result exactly as Spark does. Pinned against
    ``F.hash`` by tests/test_lake_extras.py."""
    m = 0xFFFFFFFF
    k = (x & m) * 0xCC9E2D51 & m
    k = ((k << 15) | (k >> 17)) & m
    k = k * 0x1B873593 & m
    h = (seed ^ k) & m
    h = ((h << 13) | (h >> 19)) & m
    h = (h * 5 + 0xE6546B64) & m
    h ^= 4  # total byte length
    h = (h ^ (h >> 16)) * 0x85EBCA6B & m
    h = (h ^ (h >> 13)) * 0xC2B2AE35 & m
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


@lru_cache(maxsize=64)
def _route_tokens(n_parts: int) -> tuple[int, ...]:
    """tokens[p] = smallest non-negative int whose Murmur3 hash pmods to
    exchange partition p — so repartitioning on a column holding tokens[p]
    places the row on partition p EXACTLY. Driver-side search, ~P·ln P
    probes, memoized per partition count."""
    found: dict[int, int] = {}
    t = 0
    while len(found) < n_parts:
        p = _murmur3_int32(t) % n_parts  # python % == Spark pmod for n>0
        if p not in found:
            found[p] = t
        t += 1
    return tuple(found[p] for p in range(n_parts))


def route_expr(group_id, n_parts: int):
    """Exact balanced group->partition routing column.

    ``repartition(n, hash_exprs)`` assigns each distinct (bucket, salt)
    group by Murmur3 — balls-in-bins, so with G groups over P partitions
    some partitions draw 2-3x the mean and the merge/resolve stage pays a
    measured 9-14% straggler tail (BENCH/stageprof: max task ~2x mean at
    G=144, P=24). This instead routes group g to partition (g % P) —
    every partition gets ceil(G/P) or floor(G/P) groups by construction —
    by mapping g to a driver-found token whose Murmur3 hash lands on that
    partition. The route is a pure function of (bucket, salt), itself a
    pure key function, so key colocation is unchanged; the route value is
    CONSTANT within each resulting partition, so window sorts that lead
    with it cluster identically to (bucket, salt, ...).

    Use as the ONLY repartition expression; window/cluster specs may add
    (bucket, salt) after it — HashPartitioning([route]) satisfies
    ClusteredDistribution([route, bucket, salt]), so no second exchange."""
    toks = _route_tokens(n_parts)
    arr = F.array(*[F.lit(t) for t in toks])
    idx = (F.pmod(group_id, F.lit(n_parts)) + F.lit(1)).cast("int")
    return F.element_at(arr, idx)


def layout_exprs(
    key_col: str,
    n_parts: int,
    n_salts: int,
    bucket_ids: list[int] | None = None,
):
    """(repartition exprs, clustering exprs) for a bucket-clustered stage:
    repartition on the exact route token alone; windows / in-partition
    sorts partition by (route, bucket[, salt]) — same semantic groups,
    one exchange, balanced partitions.

    ``bucket_ids``: when the stage covers a SUBSET of buckets (compaction
    of the `todo` list), round-robin needs dense group ids — raw bucket
    ids modulo n_parts would collide some partitions and leave others
    empty. The literal array maps each present bucket to its rank."""
    cluster = [F.col(BUCKET_COL)]
    if bucket_ids is not None:
        arr = F.array(*[F.lit(int(x)).cast("long") for x in sorted(bucket_ids)])
        dense_b = F.array_position(arr, F.col(BUCKET_COL).cast("long")) - F.lit(1)
    else:
        dense_b = F.col(BUCKET_COL)
    grp = dense_b
    if n_salts > 1:
        salt = in_bucket_salt(key_col, n_salts)
        cluster.append(salt)
        grp = dense_b * F.lit(n_salts) + salt
    route = route_expr(grp, n_parts)
    return [route], [route, *cluster]


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
        merge_strategy: str = "cow",
        properties: dict | None = None,
    ) -> "IceletTable":
        """``merge_strategy``:

        - ``cow`` (copy-on-write): each merge rewrites every touched bucket's
          files wholesale; reads are resolution-free. Best for read-heavy /
          batchy workloads.
        - ``mor`` (merge-on-read): each merge APPENDS the batch's winner rows
          (deletes as tombstones) as new data files — per-batch write cost is
          O(batch), never O(table); reads resolve last-writer-wins per key by
          (version_cols, file sequence) and ``compact`` folds buckets back to
          one resolution-free file. The scale path for 10^10-event streams.
        """
        if merge_strategy not in ("cow", "mor"):
            raise ValueError(f"merge_strategy must be cow|mor, got {merge_strategy!r}")
        if read_snapshot(root) is not None:
            raise FileExistsError(f"table already exists at {root}")
        tschema = (
            schema if isinstance(schema, TableSchema) else TableSchema.from_spark(schema, 0)
        )
        props = {
            "key": key_col,
            "version_cols": list(version_cols),
            "merge_strategy": merge_strategy,
        }
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

    @staticmethod
    def create_or_replace(
        spark: SparkSession,
        root: str,
        schema: T.StructType | TableSchema,
        key_col: str = "url",
        version_cols: tuple[str, str] = ("warc_ts", "lsn"),
        n_buckets: int = 16,
        merge_strategy: str = "cow",
        properties: dict | None = None,
    ) -> "IceletTable":
        """CREATE OR REPLACE: the destructive full-replay reset verb
        (reference: the ``full_run`` rebuild flag,
        /root/reference/src/how_long_to_beat.py:150-151). The replacement is
        a normal commit — a new snapshot with an empty file list, a fresh
        schema lineage, and CLEARED batch-id markers/watermark so the whole
        change stream re-applies — while every prior snapshot stays readable
        via time travel (non-destructive at the metadata level; old data
        files are reclaimed by retention, not by this verb)."""
        prev = read_snapshot(root)
        if prev is None:
            return IceletTable.create(
                spark, root, schema, key_col, version_cols, n_buckets,
                merge_strategy, properties,
            )
        if merge_strategy not in ("cow", "mor"):
            raise ValueError(f"merge_strategy must be cow|mor, got {merge_strategy!r}")
        tschema = (
            schema if isinstance(schema, TableSchema) else TableSchema.from_spark(schema, 0)
        )
        props = {
            "key": key_col,
            "version_cols": list(version_cols),
            "merge_strategy": merge_strategy,
        }
        props.update(properties or {})
        snap = Snapshot(
            version=prev.version + 1,
            parent=prev.version,
            n_buckets=n_buckets,
            schemas=[tschema],
            files=[],
            applied_batch_ids=[],
            properties=props,
        )
        write_snapshot(root, snap)
        return IceletTable(spark, root)

    def snapshot(self, version: int | None = None) -> Snapshot:
        snap = read_snapshot(self.root, version)
        if snap is None:
            raise FileNotFoundError(f"no icelet table at {self.root}")
        return snap

    @property
    def key_col(self) -> str:
        return self.snapshot().properties["key"]

    @property
    def merge_strategy(self) -> str:
        return self.snapshot().properties.get("merge_strategy", "cow")

    # ------------------------------------------------------------------ read
    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        key_range: tuple[str, str] | None = None,
        include_deleted: bool = False,
        as_schema: "TableSchema | None" = None,
        resolve: str = "window",
    ) -> DataFrame:
        """Read the table at a snapshot (time travel), optionally pruned to a
        bucket set and/or key range using manifest stats — no file listing,
        no footer reads for skipped files. Tombstone rows (``_deleted``)
        are filtered out unless ``include_deleted``. ``as_schema`` projects
        to a not-yet-committed evolved schema (fields matched by id; new
        fields read as null) — used by the merge when the incoming batch
        evolves the schema.

        Under merge-on-read, a key may appear in several delta files of its
        bucket; the read resolves last-writer-wins per key by
        (version_cols, file sequence). ``resolve`` picks the physical
        strategy: ``window`` (default — ONE payload exchange on the bucket
        hash, partition-local sort, lag-based first-of-group filter; the
        read-side twin of the fused write path) or ``skinny`` (two-phase
        skinny-agg + payload fetch join — scans the delta files twice but
        never sorts payload bytes; the r3 default, kept as a measured
        fallback). Resolution is applied PER BUCKET: only buckets whose
        files span more than one commit sequence go through the resolve
        exchange; single-sequence buckets (COW tables, compacted buckets
        of a MOR table) are unioned straight from the scan — their files
        are key-disjoint by construction, so at steady state the shuffle
        is proportional to the uncompacted delta, not the table."""
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

        # LWW resolution is needed only when a key could span two files of
        # its bucket. Within ONE commit that is impossible (bucket and the
        # in-bucket write salt are both pure key functions), so the trigger
        # is a bucket holding files from MORE THAN ONE commit sequence —
        # not a bucket holding more than one file. This keeps reads
        # resolution-free right after compaction even when the salted
        # writer folded a bucket into several same-sequence files.
        per_bucket: dict[int, set[int]] = {}
        rows_per_bucket: dict[int, int] = {}
        for f in files:
            per_bucket.setdefault(f.bucket, set()).add(f.sequence)
            rows_per_bucket[f.bucket] = rows_per_bucket.get(f.bucket, 0) + f.rows
        mor = snap.properties.get("merge_strategy", "cow") == "mor"
        needs_resolve = mor and max(len(s) for s in per_bucket.values()) > 1

        # group files by the SCHEMA VERSION they were written under and
        # re-project by field id (rename/widen are metadata-only);
        # sequence rides along as _seq for MOR version-tie resolution.
        # One reader per schema version, not per (schema, sequence): an
        # uncompacted MOR bucket set spans many commit sequences, and a
        # per-sequence reader union planned S scan branches (S ~ commits
        # since compaction) — S FileSourceScans to plan, codegen and
        # schedule for the SAME schema (measured: the 8-commit bench
        # table's post-apply read dropped 20-40% collapsing 8 branches
        # to 1). _seq is then derived per row from the commit directory in
        # the file path (data/v{seq}-{uuid8}/, the layout every writer
        # uses) — verified driver-side against the manifest for every
        # file first, with a per-sequence-reader fallback on any
        # mismatch, so resolution order can never silently drift from
        # the manifest's sequence numbers.
        # resolve="none" (internal; fused compaction) skips resolution and
        # RETAINS _seq so the caller can fold resolution into its own
        # exchange — tombstones must stay visible or older versions would
        # leak through the caller's resolve.
        if resolve == "none" and not include_deleted:
            raise ValueError("resolve='none' requires include_deleted=True")

        def _scan_union(fs, attach_seq: bool) -> DataFrame:
            by_sv: dict[int, list] = {}
            for f in fs:
                by_sv.setdefault(f.schema_version, []).append(f)
            parts = []
            for sv, metas in by_sv.items():
                old = snap.schema_at(sv)
                seqs = sorted({f.sequence for f in metas})
                one_scan = (
                    not attach_seq
                    or len(seqs) == 1
                    or all(_path_sequence(f.path) == f.sequence for f in metas)
                )
                groups = (
                    [metas]
                    if one_scan
                    else [[f for f in metas if f.sequence == s] for s in seqs]
                )
                for g in groups:
                    df = self.spark.read.schema(old.to_spark()).parquet(
                        *[os.path.join(self.root, f.path) for f in g]
                    )
                    cols = []
                    old_by_id = old.by_id()
                    for cf in cur.fields:
                        of = old_by_id.get(cf.id)
                        if of is None:  # column added after these files were written
                            cols.append(F.lit(None).cast(cf.type).alias(cf.name))
                        else:
                            cols.append(F.col(of.name).cast(cf.type).alias(cf.name))
                    if attach_seq:
                        gseqs = {f.sequence for f in g}
                        if len(gseqs) == 1:
                            cols.append(
                                F.lit(next(iter(gseqs))).cast("long").alias("_seq")
                            )
                        else:
                            cols.append(_seq_from_file_path().alias("_seq"))
                    parts.append(df.select(*cols))
            return reduce(lambda a, b: a.unionByName(b), parts)

        if resolve == "none":
            out = _scan_union(files, attach_seq=True)
        elif not needs_resolve:
            out = _scan_union(files, attach_seq=False)
        else:
            # Selective resolve: only buckets whose files span >1 commit
            # sequence can hold a key twice, so only THEIR rows pay the
            # resolve exchange. Single-sequence buckets (the steady state
            # after per-bucket auto-compaction) are unioned straight from
            # the scan — at 100 TB this keeps the shuffle proportional to
            # the uncompacted delta, not the table.
            multi = {b for b, s in per_bucket.items() if len(s) > 1}
            f_resolve = [f for f in files if f.bucket in multi]
            f_direct = [f for f in files if f.bucket not in multi]
            order = tuple(snap.properties["version_cols"]) + ("_seq",)
            out = self._resolve_lww(
                _scan_union(f_resolve, attach_seq=True),
                snap.properties["key"], order, snap.n_buckets, resolve,
                total_rows=sum(rows_per_bucket[b] for b in multi),
            ).drop("_seq")
            if f_direct:
                out = out.unionByName(_scan_union(f_direct, attach_seq=False))
        if DELETED_COL in cur.names() and not include_deleted:
            out = out.where(~F.coalesce(F.col(DELETED_COL), F.lit(False))).drop(DELETED_COL)
        return out

    def _resolve_lww(
        self,
        df: DataFrame,
        key: str,
        order_cols: tuple[str, ...],
        n_buckets: int,
        resolve: str,
        total_rows: int | None = None,
    ) -> DataFrame:
        """Read-time LWW resolution across a bucket's delta files.

        ``window``: recompute the bucket (a pure key function — no stored
        column needed), hash-partition on (_bucket[, salt(key)]), sort
        partition-locally by (key ASC, version DESC), keep each key's first
        row via the lag trick (cdc/fused.py's winner filter, reused on the
        read side). ONE exchange of payload bytes, one scan of the delta
        files — vs the skinny strategy's two scans + skinny-agg exchange +
        payload fetch-join exchange. Bucket partitioning bounds skew the
        same way the write does; the in-bucket salt keeps resolution
        parallelism from capping at n_buckets on big clusters.
        """
        if resolve == "skinny":
            from ..operators.lww import lww_dedup

            # each data file holds at most one row per (key, version) — the
            # apply wrote LWW winners — and _seq disambiguates across
            # files, so (key, order) is unique and the dropDuplicates
            # guard would only re-shuffle payload bytes for nothing
            return lww_dedup(df, key, order_cols, strategy="skinny",
                             unique_versions=True)
        if resolve != "window":
            raise ValueError(f"resolve must be window|skinny, got {resolve!r}")
        from pyspark.sql import Window

        nparts = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        src = df.withColumn(BUCKET_COL, bucket_expr(key, n_buckets))
        # spill-aware layout (sort_layout): the exchange is sized from
        # manifest row counts so each task's sorter holds a bounded row
        # count, and the salt lets buckets occupy those partitions; the
        # exact route (route_expr) balances groups over partitions, and
        # the explicit repartition's hashpartitioning satisfies the
        # window's clustering, so exactly ONE exchange is still planned
        n_parts, n_salts = sort_layout(nparts, n_buckets, total_rows)
        repart_exprs, part_exprs = layout_exprs(key, n_parts, n_salts)
        src = src.repartition(n_parts, *repart_exprs)
        w = Window.partitionBy(*part_exprs).orderBy(
            F.col(key).asc(), *[F.col(c).desc() for c in order_cols]
        )
        prev_key = F.lag(F.col(key)).over(w)
        is_first = (F.row_number().over(w) == 1) | (
            ~prev_key.eqNullSafe(F.col(key))
        )
        return (
            src.withColumn("_first", is_first)
            .where(F.col("_first"))
            .drop("_first", BUCKET_COL)
        )

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
        self,
        df: DataFrame,
        version: int,
        schema_version: int,
        post_shuffle=None,
        expected_rows: int | None = None,
    ) -> list[DataFileMeta]:
        """Write ``df`` (current-schema columns + ``_bucket``) as immutable
        per-bucket parquet files under a per-attempt unique directory
        data/v{version}-{uuid}; return their manifest entries with key bounds
        harvested from parquet footers (no data scan).

        The uuid suffix makes retries safe: a crash between the data-file
        write and the snapshot commit leaves an orphan directory no snapshot
        references, and the retried apply writes a fresh directory instead of
        colliding with the orphan (manifest entries record exact paths, so
        readers never glob).
        """
        key = self.key_col
        rel_dir = os.path.join("data", f"v{version}-{uuid.uuid4().hex[:8]}")
        out = os.path.join(self.root, rel_dir)
        # hash-repartition on (_bucket, in-bucket salt(key)): each
        # (bucket, salt) shard lands in exactly one task, so write
        # parallelism is min(nparts, n_buckets * n_salts) instead of being
        # capped at n_buckets (the r3 cap on COW merges and compaction) —
        # at most n_salts files per bucket per commit, and a key never
        # spans two shards (salt is a pure key function), so COW stays
        # resolution-free and compaction output still reads without
        # LWW resolution (all files share one sequence). Rows sorted by
        # (bucket, key) within each task so the partitionBy writer emits
        # one file per bucket per task and parquet row-group stats enable
        # key-range skipping on point lookups.
        nparts = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        n_buckets = self.snapshot().n_buckets
        # expected_rows (caller's estimate, e.g. touched-bucket manifest
        # rows) sizes the exchange so each task's SORT holds a bounded
        # row count — a huge bucket funneled into one task external-sorts
        # multi-KB payload rows (see sort_layout)
        n_parts, n_salts = sort_layout(nparts, n_buckets, expected_rows)
        repart_cols, _ = layout_exprs(key, n_parts, n_salts)
        staged = df.repartition(n_parts, *repart_cols).sortWithinPartitions(BUCKET_COL, key)
        if post_shuffle is not None:
            # optional projection applied AFTER the exchange+sort (e.g. the
            # html->text UDF on the "join" MOR path, so text bytes are
            # never shuffled or sorted)
            staged = post_shuffle(staged)
        (
            staged.write.mode("errorifexists")
            .partitionBy(BUCKET_COL)
            .parquet(out)
        )
        return self._harvest_manifest_entries(out, schema_version, version)

    def write_data_files_prepartitioned(
        self,
        df: DataFrame,
        version: int,
        schema_version: int,
        sum_col: str | None = None,
    ) -> "list[DataFileMeta] | tuple[list[DataFileMeta], int]":
        """Write ``df`` that is ALREADY partitioned so that no bucket spans
        two partitions (the fused MOR path repartitions on
        (_bucket[, salt(key)]) upstream, fusing the exchange with the LWW
        sort). No repartition, no sort: the writer runs with concurrent
        output writers so the planner does not re-sort the (already
        bucket-clustered) rows by partition column — at most
        salts-per-bucket files per bucket per commit, and write parallelism
        equals the upstream partition count instead of being capped at
        n_buckets.

        ``sum_col``: when given, each file's harvest ALSO sums that boolean
        column (the fused MOR path's tombstone count) in the same threaded
        file open as the footer read — one pass over the commit's files
        instead of two, and the return becomes ``(files, total)``."""
        rel_dir = os.path.join("data", f"v{version}-{uuid.uuid4().hex[:8]}")
        out = os.path.join(self.root, rel_dir)
        with _WRITER_CONF_LOCK:
            prev = self.spark.conf.get("spark.sql.maxConcurrentOutputFileWriters", "0")
            self.spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "128")
            try:
                df.write.mode("errorifexists").partitionBy(BUCKET_COL).parquet(out)
            finally:
                self.spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", prev)
        return self._harvest_manifest_entries(
            out, schema_version, version, sum_col=sum_col
        )

    def _harvest_manifest_entries(
        self, out: str, schema_version: int, version: int, sum_col: str | None = None
    ) -> "list[DataFileMeta] | tuple[list[DataFileMeta], int]":
        key = self.key_col
        entries = [
            (int(e.split("=")[1]), os.path.join(out, e))
            for e in sorted(os.listdir(out))
            if e.startswith(f"{BUCKET_COL}=")
        ]
        fpaths = []
        for bucket, bdir in entries:
            for fn in sorted(os.listdir(bdir)):
                if fn.endswith(".parquet"):
                    fpaths.append((bucket, os.path.join(bdir, fn)))
        # footer harvesting is metadata-only but file-count-bound: do it in
        # a thread pool (I/O-released GIL in pyarrow) instead of serially.
        from concurrent.futures import ThreadPoolExecutor

        def _one(item):
            bucket, fpath = item
            rows, kmin, kmax, extra = _footer_stats(fpath, key, sum_col)
            return DataFileMeta(
                path=os.path.relpath(fpath, self.root),
                bucket=bucket,
                rows=rows,
                min_key=kmin,
                max_key=kmax,
                schema_version=schema_version,
                sequence=version,
            ), extra

        if len(fpaths) <= 2:
            harvested = [_one(it) for it in fpaths]
        else:
            with ThreadPoolExecutor(max_workers=min(32, len(fpaths))) as pool:
                harvested = list(pool.map(_one, fpaths))
        files = [f for f, _ in harvested]
        if sum_col is None:
            return files
        return files, sum(x for _, x in harvested)

    def commit(
        self,
        new_files: list[DataFileMeta],
        replaced_buckets: set[int],
        batch_ids: list[int],
        new_schema: TableSchema | None = None,
        properties_update: dict | None = None,
        expected_version: int | None = None,
    ) -> Snapshot:
        """Build + atomically publish the next snapshot: files of untouched
        buckets carry forward; touched buckets are fully replaced by
        ``new_files`` (copy-on-write).

        The whole read-modify-publish section runs under the table write
        lock, and ``expected_version`` (the snapshot version the caller's
        work was based on) is CAS-checked under it: a concurrent commit in
        between raises ``CommitConflictError`` instead of silently losing
        that commit's files/markers or reusing its sequence number
        (lake/locking.py; Iceberg-style optimistic concurrency)."""
        from .locking import CommitConflictError, table_write_lock

        with table_write_lock(self.root):
            snap = self.snapshot()
            if expected_version is not None and snap.version != expected_version:
                raise CommitConflictError(
                    f"table at {self.root} is at snapshot {snap.version}, "
                    f"but this work was based on {expected_version}; retry"
                )
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


def _footer_stats(
    path: str, key: str, sum_col: str | None = None
) -> tuple[int, str | None, str | None, int]:
    """rows + min/max of the key column from parquet footer metadata only;
    when ``sum_col`` is given, additionally the sum of that boolean column
    (a column-pruned read sharing the same file handle)."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    extra = 0
    if sum_col is not None:
        import pyarrow.compute as pc

        t = pf.read(columns=[sum_col])
        extra = int(pc.sum(t[sum_col]).as_py() or 0)
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
    return md.num_rows, kmin, kmax, extra
