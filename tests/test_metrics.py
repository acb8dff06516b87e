from __future__ import annotations

from pyspark.sql import functions as F

from caterpillar_spark.generator import GeneratorSpec, write_changelog_chunks
from caterpillar_spark.streaming import stream_changelog
from caterpillar_spark.streaming.metrics import windowed_event_rate

SPEC = GeneratorSpec(n_events=3_600, n_convs=20, turns_per_conv=10, seed=3)


def test_windowed_event_rate_stream(spark, tmp_path):
    log = str(tmp_path / "log")
    write_changelog_chunks(spark, SPEC, log, n_chunks=2)
    rates = windowed_event_rate(
        stream_changelog(spark, log), window="10 minutes", watermark="1 minute"
    )
    q = (
        rates.writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM rates")
    # generator emits 1 event/sec -> 600 per 10-min window; total conserved
    # (the last window may be held back by the watermark in append mode)
    assert got.count() >= 5
    # interior 10-min windows hold exactly 600 events (generator: 1 ev/sec),
    # split across source partitions
    per_window = {
        r["window_start"]: r["s"]
        for r in got.groupBy("window_start").agg(F.sum("n_events").alias("s")).collect()
    }
    assert 600 in per_window.values()
    per_part = got.groupBy("source_partition").agg(F.sum("n_events"))
    assert per_part.count() == SPEC.n_source_partitions


def test_batch_mode_rate(spark, tmp_path):
    log = str(tmp_path / "log")
    write_changelog_chunks(spark, SPEC, log, n_chunks=1)
    df = spark.read.parquet(f"{log}/chunk-00000")
    rates = windowed_event_rate(df, window="10 minutes")
    total = rates.agg(F.sum("n_events")).collect()[0][0]
    assert total == SPEC.n_events
