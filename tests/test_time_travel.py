from __future__ import annotations

from pyspark.sql import types as T

from caterpillar_spark.cdc import replay_chunks
from caterpillar_spark.generator import GeneratorSpec, change_events, write_changelog_chunks
from caterpillar_spark.operators.dedup import last_writer_wins
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
SPEC = GeneratorSpec(n_events=4_000, n_convs=20, turns_per_conv=10, seed=41)


def test_time_travel_reads_old_snapshot(spark, tmp_path):
    chunks = write_changelog_chunks(spark, SPEC, str(tmp_path / "log"), n_chunks=4)
    tbl = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8).create(PAYLOAD)
    replay_chunks(spark, chunks, tbl)
    assert tbl.current_version() == 4
    # version 2 == state after the first two chunks only
    import pyspark.sql.functions as F

    ev = change_events(spark, SPEC).filter(F.col("lsn") < SPEC.n_events // 2)
    lww = last_writer_wins(ev)
    expected_v2 = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in lww.filter(F.col("op") != "D").collect()
    )
    got_v2 = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in tbl.read(version=2).collect()
    )
    assert got_v2 == expected_v2
    # current state still differs from v2 (later chunks applied)
    assert tbl.read().count() != len(got_v2) or sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in tbl.read().collect()
    ) != got_v2
