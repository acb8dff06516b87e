"""Table maintenance: optimistic-concurrency conflicts, snapshot expiry."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from caterpillar_spark.cdc import replay_chunks
from caterpillar_spark.generator import GeneratorSpec, write_changelog_chunks
from caterpillar_spark.sinks.snapshot_table import SnapshotTable

PAYLOAD = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
SPEC = GeneratorSpec(n_events=3_000, n_convs=15, turns_per_conv=10, seed=53)


def test_concurrent_commit_conflict(spark, tmp_path):
    """A competing writer that claims the next version first makes our
    commit fail loudly (optimistic concurrency, like Iceberg) — never a
    silent overwrite."""
    tbl = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4).create(PAYLOAD)
    chunks = write_changelog_chunks(spark, SPEC, str(tmp_path / "log"), n_chunks=2)
    replay_chunks(spark, chunks[:1], tbl)
    # competing writer sneaks in version 2
    v2 = tbl._snap_path(2)
    with open(v2, "w") as f:
        json.dump(json.load(open(tbl._snap_path(1))), f)
    with pytest.raises(FileExistsError):
        replay_chunks(spark, chunks[1:], tbl)


def test_expire_snapshots(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4).create(PAYLOAD)
    chunks = write_changelog_chunks(spark, SPEC, str(tmp_path / "log"), n_chunks=3)
    replay_chunks(spark, chunks, tbl)
    state = sorted(tuple(r) for r in tbl.read().collect())
    data_root = str(tmp_path / "t" / "data")
    assert len(os.listdir(data_root)) == 3  # one dir per commit
    removed = tbl.expire_snapshots(keep_last=1)
    # current snapshot still fully readable, byte-identical state
    assert sorted(tuple(r) for r in tbl.read().collect()) == state
    # old-only dirs gone (v3 may reference older dirs for untouched buckets,
    # so we assert only that expiry removed something AND nothing live)
    assert all(not os.path.exists(d) for d in removed)
    live = {
        os.path.dirname(f)
        for files in tbl.snapshot().buckets.values()
        for f in files
    }
    assert all(os.path.isdir(d) for d in live)
