"""Streaming throughput metrics — windowed event counts over the change
stream with a watermark.

The reference has no event-time machinery (SURVEY.md §2.9 "not present");
the CDC engine itself doesn't need it either (last-writer-wins is by LSN,
not ts). This module exists for the metrics side-channel the north rule
asks for ("plus throughput metrics"): a tumbling-window per-source-
partition event-rate stream whose state is bounded by a watermark so a
10^10-event replay can't grow state without limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_rate(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    by_partition: bool = True,
) -> DataFrame:
    """events/window per source partition, late data bounded by watermark.

    Append-output-compatible (aggregation on the watermarked event-time
    window), so it can feed any sink including files.
    """
    keys = [F.window("ts", window).alias("win")]
    if by_partition and "source_partition" in stream.columns:
        keys.append(F.col("source_partition"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n_events"),
            F.min("lsn").alias("lsn_lo"),
            F.max("lsn").alias("lsn_hi"),
        )
    )
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *(["source_partition"] if len(keys) > 1 else []),
        "n_events",
        "lsn_lo",
        "lsn_hi",
    )
