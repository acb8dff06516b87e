"""SnapshotTable — a transactional, bucketed, snapshot-versioned lake table
on plain parquet. The sandbox stand-in for Iceberg with the same contract:
atomic commits, exactly-once via an offset ledger stored IN the snapshot,
additive schema evolution, tombstoned deletes, per-partition lineage.

Layout::

    <root>/
      _log/v000000000042.json     # snapshot files; commit = atomic create
      data/v42/part-*.parquet     # flat files; snapshot maps bucket -> files
                                  # (pid(b) = pmod(murmur3(b), n) is
                                  # deterministic, so the writer needs no
                                  # dynamic-partition committer — 3-5x faster)

Concurrency/atomicity model (single writer, many readers — same posture as
a Structured Streaming ``foreachBatch`` sink): a commit writes the data
files first, then creates the next snapshot JSON with ``os.link`` (fails if
the version already exists → optimistic-concurrency conflict, like
Iceberg's commit protocol). Readers resolve the max committed version; a
crashed writer leaves only unreferenced data files, never a torn table.

Exactly-once (the upgrade over the reference's store-offset-after-delivery
at-least-once rule, ``internal/pkg/pipeline/task/kafka/kafka.go:288-293,
404-406``): each snapshot embeds the cumulative set of applied
``(stream_id, [lo, hi])`` LSN ranges. A merge whose range is already
applied is a no-op; offsets and data commit in ONE atomic rename, so replay
from any checkpoint converges. Deletes are tombstones (``_deleted``), which
makes row-level merge idempotent and commutative under re-delivery as well;
``compact()`` physically drops tombstones later.

Scale design (100 TB / 1000 executors):
- rows hash-bucketed by ``conv_id`` into ``n_buckets`` fixed buckets; a
  merge touches ONLY buckets containing changed keys (partition pruning at
  the file level) and shuffles only the incoming batch + affected buckets,
  never the whole table;
- the merge reduction is a hash aggregate (``max_by``) with map-side
  partial combine — hot conv_ids pre-reduce before the shuffle;
- snapshot JSON holds bucket→directory pointers, O(n_buckets) metadata,
  no per-file listing on the read path.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY = ["conv_id", "turn_idx"]
_SYS_COLS = ["_lsn", "_deleted", "_b"]


@dataclass
class LineageEntry:
    """One per (batch, source_partition): FIXTURES.md §3 manifest row."""

    batch_id: int
    offset_start: int
    offset_end: int
    snapshot_id: int
    rows_applied: int
    partition: int
    t_start: float
    t_end: float


@dataclass
class Snapshot:
    version: int
    schema_json: str  # Spark StructType json of PAYLOAD columns (no sys cols)
    buckets: dict[str, list[str]]  # bucket id (str) -> data file paths
    applied: dict[str, list[list[int]]]  # stream_id -> merged [lo, hi] ranges
    lineage: list[dict] = field(default_factory=list)  # this commit's entries
    parent: int | None = None
    properties: dict = field(default_factory=dict)


MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("offset_start", T.LongType()),
        T.StructField("offset_end", T.LongType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("rows_applied", T.LongType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("t_start", T.DoubleType()),
        T.StructField("t_end", T.DoubleType()),
    ]
)


def _merge_ranges(ranges: list[list[int]]) -> list[list[int]]:
    out: list[list[int]] = []
    for lo, hi in sorted(ranges):
        if out and lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return out


def _covered(ranges: list[list[int]], lo: int, hi: int) -> bool:
    return any(a <= lo and hi <= b for a, b in ranges)


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 64):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self._log_dir = os.path.join(root, "_log")
        self._pid_cache: dict[int, int] | None = None

    # ------------------------------------------------------------- log io
    def _snap_path(self, v: int) -> str:
        return os.path.join(self._log_dir, f"v{v:012d}.json")

    def exists(self) -> bool:
        return os.path.isdir(self._log_dir) and bool(os.listdir(self._log_dir))

    def current_version(self) -> int:
        versions = [
            int(f[1:13])
            for f in os.listdir(self._log_dir)
            if f.endswith(".json") and f.startswith("v")
        ]
        if not versions:
            raise FileNotFoundError(f"no snapshots in {self._log_dir}")
        return max(versions)

    def snapshot(self, version: int | None = None) -> Snapshot:
        v = self.current_version() if version is None else version
        with open(self._snap_path(v)) as f:
            return Snapshot(**json.load(f))

    def _commit(self, snap: Snapshot) -> None:
        """Atomic create of the next snapshot file (fails on conflict)."""
        os.makedirs(self._log_dir, exist_ok=True)
        final = self._snap_path(snap.version)
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(asdict(snap), f)
        try:
            os.link(tmp, final)  # atomic; raises FileExistsError on conflict
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------------- create
    def create(self, payload_schema: T.StructType) -> "SnapshotTable":
        if self.exists():
            raise FileExistsError(f"table already exists at {self.root}")
        snap = Snapshot(
            version=0,
            schema_json=payload_schema.json(),
            buckets={},
            applied={},
            parent=None,
            properties={"n_buckets": self.n_buckets},
        )
        self._commit(snap)
        return self

    # -------------------------------------------------------------- reads
    def payload_schema(self, snap: Snapshot | None = None) -> T.StructType:
        snap = snap or self.snapshot()
        return T.StructType.fromJson(json.loads(snap.schema_json))

    def _stored_schema(self, snap: Snapshot) -> T.StructType:
        s = self.payload_schema(snap)
        return T.StructType(
            list(s.fields)
            + [
                T.StructField("_lsn", T.LongType()),
                T.StructField("_deleted", T.BooleanType()),
                T.StructField("_b", T.IntegerType()),
            ]
        )

    def _pid_of_bucket(self) -> dict[int, int]:
        """bucket id -> shuffle partition id under repartition(n_buckets, _b).

        Data files are written FLAT (a dynamic partitionBy writer costs
        3-5x: per-directory committers + a sort) and bucket pruning instead
        uses the fact that Spark's HashPartitioning is deterministic:
        pid(b) = pmod(murmur3(b), n). Computed once via a tiny Spark job so
        the constant (seed 42) stays in one place — Spark's own hash."""
        if self._pid_cache is None:
            rows = (
                self.spark.range(self.n_buckets)
                .select(
                    F.col("id").cast("int").alias("b"),
                    F.pmod(
                        F.hash(F.col("id").cast("int")), F.lit(self.n_buckets)
                    ).alias("p"),
                )
                .collect()
            )
            self._pid_cache = {int(r["b"]): int(r["p"]) for r in rows}
        return self._pid_cache

    @staticmethod
    def _part_files_by_pid(data_dir: str) -> dict[int, list[str]]:
        out: dict[int, list[str]] = {}
        for f in os.listdir(data_dir):
            if f.startswith("part-") and f.endswith(".parquet"):
                pid = int(f.split("-")[1])
                out.setdefault(pid, []).append(os.path.join(data_dir, f))
        return out

    def _read_buckets(self, snap: Snapshot, bucket_ids: list[int]) -> DataFrame:
        """Read stored rows (incl. tombstones + sys cols) for the buckets.

        An explicit read schema makes additive evolution free: files written
        before a column existed return null for it — no rewrite.
        """
        schema = self._stored_schema(snap)
        paths = sorted(
            {p for b in bucket_ids for p in snap.buckets.get(str(b), [])}
        )
        if not paths:
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).parquet(*paths)
        if len(bucket_ids) < self.n_buckets:
            # a flat file can hold several co-hashed buckets; the pushed-down
            # _b filter restores exact bucket pruning
            df = df.filter(F.col("_b").isin([int(b) for b in bucket_ids]))
        return df

    def read(
        self, include_deleted: bool = False, version: int | None = None
    ) -> DataFrame:
        """Table state (live rows, payload columns only). ``version`` time-
        travels to an older snapshot — every snapshot's file set is
        immutable, so historical reads are free (same as Iceberg's
        ``VERSION AS OF``)."""
        snap = self.snapshot(version)
        df = self._read_buckets(snap, list(range(self.n_buckets)))
        if not include_deleted:
            df = df.filter(~F.col("_deleted"))
        return df.drop(*_SYS_COLS) if not include_deleted else df

    def manifest(self) -> DataFrame:
        """All lineage entries across the snapshot history (FIXTURES.md §3)."""
        rows = []
        v = self.current_version()
        while v is not None:
            snap = self.snapshot(v)
            rows.extend(snap.lineage)
            v = snap.parent
        return self.spark.createDataFrame(
            [tuple(r[f.name] for f in MANIFEST_SCHEMA.fields) for r in rows],
            MANIFEST_SCHEMA,
        )

    def applied_ranges(self, stream_id: str = "default") -> list[list[int]]:
        return self.snapshot().applied.get(stream_id, [])

    # -------------------------------------------------------------- merge
    def bucket_expr(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(self.n_buckets)).cast("int")

    _bucket_col = bucket_expr

    def merge(
        self,
        updates: DataFrame,
        batch_id: int,
        offset_range: tuple[int, int],
        partition_counts: list[tuple[int, int]] | None = None,
        stream_id: str = "default",
        t_start: float | None = None,
        affected_buckets: list[int] | None = None,
        observe_partitions: int = 32,
    ) -> tuple[int, list[tuple[int, int]] | None]:
        """Apply a change batch (``op`` + ``lsn`` columns; multiple events
        per key allowed — the merge aggregation is itself the last-writer-
        wins reducer). Returns ``(version, observed_counts)``: version -1
        if the offset range was already applied (idempotent no-op).

        If ``partition_counts`` is None, per-source-partition lineage
        counts are collected by ``observe()`` DURING the merge job (zero
        extra passes) for partition ids in [0, observe_partitions); the
        remainder lands in a catch-all -1 row.

        Semantics = Iceberg ``MERGE INTO t USING u ON key WHEN MATCHED AND
        op='D' THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED AND
        op<>'D' THEN INSERT`` (SURVEY.md §7.2), implemented as a bucket-local
        union + max_by reduction over (stored ∪ incoming) rows.
        """
        t0 = t_start if t_start is not None else time.time()
        snap = self.snapshot()
        lo, hi = offset_range
        prior = snap.applied.get(stream_id, [])
        if _covered(prior, lo, hi):
            return -1, None  # exactly-once: already applied

        # ---- lineage-by-observation (no extra pass) ---------------------
        observation = None
        if partition_counts is None:
            from pyspark.sql import Observation

            has_sp = "source_partition" in updates.columns
            sp = (
                F.col("source_partition") if has_sp else F.lit(-1)
            )
            observation = Observation(f"lineage_b{batch_id}")
            metrics = [
                F.sum(
                    F.when(sp == i, 1).otherwise(0)
                ).alias(f"p{i}")
                for i in range(observe_partitions if has_sp else 0)
            ]
            metrics.append(
                F.sum(
                    F.when(
                        (sp < 0) | (sp >= observe_partitions), 1
                    ).otherwise(0)
                ).alias("rest")
            )
            updates = updates.observe(observation, *metrics)
        updates = (
            updates.drop("source_partition")
            if "source_partition" in updates.columns
            else updates
        )

        # ---- schema evolution (additive) --------------------------------
        table_schema = self.payload_schema(snap)
        table_cols = {f.name for f in table_schema.fields}
        incoming_payload = [
            f for f in updates.schema.fields if f.name not in ("op", "lsn")
        ]
        new_fields = [f for f in incoming_payload if f.name not in table_cols]
        evolved = T.StructType(
            list(table_schema.fields)
            + [T.StructField(f.name, f.dataType, True) for f in new_fields]
        )
        payload_cols = [f.name for f in evolved.fields]
        # updates may also MISS columns (older producer): fill with null
        upd = updates
        for f in evolved.fields:
            if f.name not in updates.columns:
                upd = upd.withColumn(f.name, F.lit(None).cast(f.dataType))

        # ---- bucket-pruned read-modify-write ----------------------------
        upd = upd.select(
            *payload_cols,
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "D").alias("_deleted"),
        ).withColumn("_b", self._bucket_col())
        affected = (
            affected_buckets
            if affected_buckets is not None
            else sorted(r[0] for r in upd.select("_b").distinct().collect())
        )
        current = self._read_buckets(snap, affected)
        for f in new_fields:  # stored side lacks brand-new columns
            current = current.withColumn(f.name, F.lit(None).cast(f.dataType))
        current = current.select(*upd.columns)

        combined = current.unionByName(upd)
        winner = (
            combined.groupBy("conv_id", "turn_idx")
            .agg(
                F.max_by(
                    F.struct(
                        *[c for c in payload_cols if c not in KEY], "_deleted", "_b"
                    ),
                    F.col("_lsn"),
                ).alias("_w"),
                F.max("_lsn").alias("_lsn"),
            )
            .select(
                *KEY,
                *[
                    F.col(f"_w.{c}").alias(c)
                    for c in payload_cols
                    if c not in KEY
                ],
                "_lsn",
                F.col("_w._deleted").alias("_deleted"),
                F.col("_w._b").alias("_b"),
            )
        )

        new_version = snap.version + 1
        data_dir = os.path.join(self.root, "data", f"v{new_version}")
        (
            winner.repartition(self.n_buckets, F.col("_b"))
            .write.mode("overwrite")
            .parquet(data_dir)
        )

        # affected buckets now point at this commit's files (flat write:
        # bucket b lives in the file of shuffle partition pid(b))
        pid = self._pid_of_bucket()
        by_pid = self._part_files_by_pid(data_dir)
        new_buckets = dict(snap.buckets)
        for b in affected:
            new_buckets[str(b)] = by_pid.get(pid[b], [])

        # ---- lineage + ledger -------------------------------------------
        t1 = time.time()
        obs_counts: list[tuple[int, int]] | None = None
        if partition_counts is None:
            got = observation.get  # blocks until the write action's metrics
            obs_counts = [
                (int(k[1:]), int(v))
                for k, v in got.items()
                if k.startswith("p") and v
            ]
            if got.get("rest"):
                obs_counts.append((-1, int(got["rest"])))
            partition_counts = sorted(obs_counts) or [(-1, 0)]
        lineage = [
            asdict(
                LineageEntry(
                    batch_id=batch_id,
                    offset_start=lo,
                    offset_end=hi,
                    snapshot_id=new_version,
                    rows_applied=int(n),
                    partition=int(p),
                    t_start=t0,
                    t_end=t1,
                )
            )
            for p, n in partition_counts
        ]
        applied = dict(snap.applied)
        applied[stream_id] = _merge_ranges(prior + [[lo, hi]])
        self._commit(
            Snapshot(
                version=new_version,
                schema_json=evolved.json(),
                buckets=new_buckets,
                applied=applied,
                lineage=lineage,
                parent=snap.version,
                properties=snap.properties,
            )
        )
        return new_version, obs_counts

    # ------------------------------------------------------------ expire
    def expire_snapshots(self, keep_last: int = 10) -> list[str]:
        """Delete data directories referenced ONLY by snapshots older than
        the ``keep_last`` most recent (Iceberg's expire_snapshots).
        Snapshot JSONs are kept (they are tiny and hold the lineage
        history); their data becomes unreadable. Returns removed dirs."""
        import shutil

        current = self.current_version()
        keep_versions = range(max(0, current - keep_last + 1), current + 1)
        live_dirs: set[str] = set()
        for v in keep_versions:
            snap = self.snapshot(v)
            for files in snap.buckets.values():
                live_dirs.update(os.path.dirname(f) for f in files)
        data_root = os.path.join(self.root, "data")
        removed = []
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                full = os.path.join(data_root, d)
                if full not in live_dirs:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(full)
        return removed

    # ------------------------------------------------------------ compact
    def compact(self, drop_tombstones: bool = True) -> int:
        """Rewrite all buckets (small-file compaction; optionally purge
        tombstones once replay protection no longer needs them)."""
        snap = self.snapshot()
        live = [b for b in range(self.n_buckets) if snap.buckets.get(str(b))]
        if not live:
            return snap.version
        df = self._read_buckets(snap, live)
        if drop_tombstones:
            df = df.filter(~F.col("_deleted"))
        new_version = snap.version + 1
        data_dir = os.path.join(self.root, "data", f"v{new_version}")
        (
            df.repartition(self.n_buckets, F.col("_b"))
            .write.mode("overwrite")
            .parquet(data_dir)
        )
        pid = self._pid_of_bucket()
        by_pid = self._part_files_by_pid(data_dir)
        new_buckets = {
            str(b): by_pid.get(pid[b], []) for b in range(self.n_buckets)
        }
        self._commit(
            Snapshot(
                version=new_version,
                schema_json=snap.schema_json,
                buckets=new_buckets,
                applied=snap.applied,
                lineage=[],
                parent=snap.version,
                properties=snap.properties,
            )
        )
        return new_version
