"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBS
(deterministic fakes / NotImplementedError) — but the Spark-side plumbing
is real and tested: schema contract, batch iteration shape, partition
sizing, metadata propagation. Swap ``_decode_image_stub`` for a PIL/ffmpeg
kernel on a real cluster and nothing else changes.

Reference ancestry: the reference treats payloads as opaque bytes
(``internal/pkg/pipeline/record/record.go:11``) and converts at the edges
(``task/converter/*``); this module is the same posture for media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from caterpillar_spark.operators import register

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """STUB decode: deterministic fake feature from the bytes themselves
    (byte-histogram projection). A real kernel would be:
    ``PIL.Image.open(io.BytesIO(payload))`` → resize → embed.
    Raises on None to mirror real decoder failure paths."""
    if payload is None:
        raise NotImplementedError("no payload; real decoder absent in sandbox")
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    denom = float(hist.sum()) or 1.0
    return hist / denom


@register("media_features")
def extract_features(df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas (Arrow batches).

    Batch shape: iterator of pandas frames, one output row per input row —
    the UDTF-style 1:1 mapping. Partitioning: upstream should
    ``repartition`` by size so each Arrow batch holds ~10k rows max
    (session default ``maxRecordsPerBatch``)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p, feat_dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    # ship only the columns the kernel touches across the Arrow boundary
    # (guide §4.1: Spark cannot see inside the function, so an unprojected
    # mapInPandas serializes every column — mime/width/height/duration
    # would cross for nothing)
    return df.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


@register("media_frame_sample")
def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: expands each video into
    frame-timestamp rows (decode stubbed; the explode shape is real)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_ms", F.explode(frames))
        .select("media_id", "frame_ms", "mime")
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload bytes derived from
    the id — no external data). Partition count scales with the row count
    (~10k rows per Arrow batch) instead of inheriting ``range``'s default
    ``defaultParallelism``: 128 rows over 32 partitions meant 32 Python
    workers each fed a 4-row batch — pure per-task overhead."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    parts = max(
        1, min(int(spark.sparkContext.defaultParallelism), n // 10_000 + 1)
    )
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.sha2(F.col("id").cast("string"), 256)),
            "utf-8",
        ).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width").cast("int"),
        F.lit(64).alias("height").cast("int"),
        ((F.col("id") % 10 + 1) * 1000).cast("int").alias("duration_ms"),
    )
