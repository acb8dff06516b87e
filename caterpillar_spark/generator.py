"""Deterministic synthetic change-event generator (binlog/WAL stand-in).

Produces the ``change_events`` stream of FIXTURES.md §2:
``(lsn, op, conv_id, turn_idx, role, text, tool, ts, source_partition)``.

Design constraints (BASELINE.json north_rule + FIXTURES.md invariants):

- **Strictly increasing, globally unique ``lsn``** — it is ``spark.range``'s
  id, so ties are impossible by construction (the determinism prerequisite
  for last-writer-wins; conceptual ancestor is the reference's per-task
  record sequence, ``internal/pkg/pipeline/task/task.go:95-108``).
- **Every key receives an ``I`` before any ``U``/``D``** — the first
  ``n_keys`` LSNs are the inserts, one per key, in key order; later LSNs
  are updates/deletes/upserts ("UP" may also target never-inserted keys,
  exercising the MERGE not-matched path).
- **Zipf-ish skew**: ~1% of conversations ("hot" convs) receive ~50% of
  the update traffic, forcing the skew-salting path.
- **Every column is a pure expression of ``lsn``** (xxhash64-derived), so
  the generated frame is byte-identical at local[1] vs local[32] and never
  needs to be materialized to be reproducible. No rand(), no uuid(), no
  current_timestamp() — those are banned from certified paths.

The reference's generator-equivalent is its test fixture corpus
(``test/pipelines/*.yaml``); ours is executable at 10^8+ rows because it
is a ``spark.range`` projection (whole-stage codegen, no Python).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]


@dataclass(frozen=True)
class GeneratorSpec:
    """Shape of a deterministic change stream."""

    n_events: int = 100_000
    n_convs: int = 1_000
    turns_per_conv: int = 10
    seed: int = 42
    hot_frac: float = 0.01  # fraction of convs that are hot
    hot_traffic: float = 0.5  # fraction of post-insert traffic hitting hot convs
    delete_pct: int = 5  # % of post-insert events that are deletes
    upsert_pct: int = 10  # % of post-insert events that are upserts (may be cold keys)
    n_source_partitions: int = 8
    # keys beyond the inserted keyspace that UP events may create
    extra_upsert_convs: int = 50

    @property
    def n_keys(self) -> int:
        return self.n_convs * self.turns_per_conv

    @property
    def n_hot(self) -> int:
        return max(1, int(self.n_convs * self.hot_frac))


def _h(col: Column, salt: str, seed: int) -> Column:
    """Deterministic non-negative 63-bit hash of (col, salt, seed)."""
    return F.abs(F.xxhash64(col, F.lit(salt), F.lit(seed)))


def change_events(spark: SparkSession, spec: GeneratorSpec) -> DataFrame:
    """Build the change-event DataFrame. Pure projection over spark.range."""
    n_keys = spec.n_keys
    lsn = F.col("id")
    is_insert_phase = lsn < n_keys

    # ---- key selection -------------------------------------------------
    # insert phase: key index == lsn (one insert per key, key order)
    # update phase: hot convs soak up `hot_traffic` of events; the rest
    # spread uniformly over all convs. Within a conv, target a turn
    # uniformly. Hot convs are conv indices [0, n_hot).
    h_route = _h(lsn, "route", spec.seed) % 1_000_000
    hot_cut = int(spec.hot_traffic * 1_000_000)
    hot_conv = _h(lsn, "hotpick", spec.seed) % spec.n_hot
    cold_conv = _h(lsn, "coldpick", spec.seed) % spec.n_convs
    upd_conv = F.when(h_route < hot_cut, hot_conv).otherwise(cold_conv)
    upd_turn = (_h(lsn, "turn", spec.seed) % spec.turns_per_conv).cast("int")

    ins_conv = (lsn / spec.turns_per_conv).cast("long")
    ins_turn = (lsn % spec.turns_per_conv).cast("int")

    # ---- op ------------------------------------------------------------
    h_op = _h(lsn, "op", spec.seed) % 100
    op = (
        F.when(is_insert_phase, F.lit("I"))
        .when(h_op < spec.delete_pct, F.lit("D"))
        .when(h_op < spec.delete_pct + spec.upsert_pct, F.lit("UP"))
        .otherwise(F.lit("U"))
    )

    # upserts may target a conv beyond the inserted keyspace (cold insert
    # through MERGE's not-matched arm)
    up_extra = _h(lsn, "upx", spec.seed) % (spec.n_convs + spec.extra_upsert_convs)
    conv_idx = F.when(is_insert_phase, ins_conv).otherwise(
        F.when(op == "UP", up_extra).otherwise(upd_conv)
    )
    turn_idx = F.when(is_insert_phase, ins_turn).otherwise(upd_turn)

    conv_id = F.format_string("conv_%08d", conv_idx)
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (turn_idx % len(ROLES)) + 1
    )
    # text payload: unique per (key, lsn) so last-writer-wins is observable
    text = F.when(op == "D", F.lit(None).cast("string")).otherwise(
        F.format_string(
            "turn text %s #%d rev=%d :: %s",
            conv_id,
            turn_idx,
            lsn,
            F.sha2(F.concat(conv_id, turn_idx.cast("string"), lsn.cast("string")), 256),
        )
    )
    tool = F.when(
        (role == "tool") & (op != "D"),
        F.element_at(
            F.array(F.lit("search"), F.lit("python"), F.lit("browser"), F.lit("sql")),
            ((_h(lsn, "tool", spec.seed) % 4) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))
    ts = F.timestamp_micros(
        F.lit(1_700_000_000_000_000) + lsn * 1_000_000
    )  # 1s apart, µs precision
    source_partition = (
        _h(conv_id, "srcpart", spec.seed) % spec.n_source_partitions
    ).cast("int")

    return (
        spark.range(0, spec.n_events)
        .select(
            lsn.alias("lsn"),
            op.alias("op"),
            conv_id.alias("conv_id"),
            turn_idx.alias("turn_idx"),
            F.when(op == "D", F.lit(None).cast("string")).otherwise(role).alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            ts.alias("ts"),
            source_partition.alias("source_partition"),
        )
    )


def write_changelog_chunks(
    spark: SparkSession,
    spec: GeneratorSpec,
    out_dir: str,
    n_chunks: int,
    drop_tool_before_chunk: int | None = None,
) -> list[str]:
    """Materialize the stream as ordered parquet chunks (the on-disk binlog).

    Chunk k holds the contiguous LSN range [k*sz, min((k+1)*sz, n)) — an
    ordered log segment, like a binlog file. ``drop_tool_before_chunk``
    omits the ``tool`` column from early chunks to drive the
    schema-evolution path (FIXTURES.md: "arrives mid-stream").
    """
    df = change_events(spark, spec)
    sz = (spec.n_events + n_chunks - 1) // n_chunks
    paths = []
    for k in range(n_chunks):
        lo, hi = k * sz, min((k + 1) * sz, spec.n_events)
        if lo >= hi:
            break
        chunk = df.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        if drop_tool_before_chunk is not None and k < drop_tool_before_chunk:
            chunk = chunk.drop("tool")
        path = f"{out_dir}/chunk-{k:05d}"
        chunk.coalesce(max(1, (hi - lo) // 250_000 + 1)).write.mode(
            "overwrite"
        ).parquet(path)
        paths.append(path)
    return paths


def expected_final_state(events: DataFrame) -> DataFrame:
    """Independent oracle reduction: per (conv_id, turn_idx) keep the
    max-lsn event; drop keys whose last op is D. Used only by tests to
    certify the engine (FIXTURES.md §2 'final state oracle')."""
    winner = F.max_by(
        F.struct("op", "role", "text", "tool", "ts"), F.col("lsn")
    ).alias("w")
    out = (
        events.groupBy("conv_id", "turn_idx")
        .agg(winner, F.max("lsn").alias("_lsn"))
        .filter(F.col("w.op") != "D")
        .select(
            "conv_id",
            "turn_idx",
            F.col("w.role").alias("role"),
            F.col("w.text").alias("text"),
            F.col("w.tool").alias("tool"),
            F.col("w.ts").alias("ts"),
            "_lsn",
        )
    )
    return out
