"""applyInPandasWithState LSN high-watermark filter: suppresses
re-delivered / stale events across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from caterpillar_spark.generator import GeneratorSpec, change_events
from caterpillar_spark.streaming import stream_changelog
from caterpillar_spark.streaming.stateful import lsn_highwater_filter

SPEC = GeneratorSpec(n_events=2_000, n_convs=10, turns_per_conv=10, seed=17)


def test_highwater_filter_suppresses_redelivery(spark, tmp_path):
    log = str(tmp_path / "log")
    ev = change_events(spark, SPEC)
    # segment 0: the whole stream; segment 1: a REDELIVERY of the first
    # half (the reference's at-least-once crash-replay shape,
    # kafka.go:288-293). File stream order = file name order here.
    ev.coalesce(1).write.parquet(f"{log}/chunk-00000")
    ev.filter(F.col("lsn") < SPEC.n_events // 2).coalesce(1).write.parquet(
        f"{log}/chunk-00001"
    )
    filtered = lsn_highwater_filter(
        stream_changelog(spark, log, max_files_per_trigger=1)
    )
    q = (
        filtered.writeStream.format("memory")
        .queryName("hw")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM hw")
    # every original event passes once; the redelivered half is suppressed
    assert got.count() == SPEC.n_events
    assert got.select("lsn").distinct().count() == SPEC.n_events
    # per-key max preserved
    agg = got.groupBy("conv_id", "turn_idx").agg(F.max("lsn").alias("m"))
    raw = ev.groupBy("conv_id", "turn_idx").agg(F.max("lsn").alias("m"))
    assert agg.exceptAll(raw).count() == 0 and raw.exceptAll(agg).count() == 0
