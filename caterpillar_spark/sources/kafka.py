"""Kafka change-log source — parity with the reference's ``kafka`` task
(``task/kafka/kafka.go:203-301``), gated: no broker exists in the sandbox,
so this module only BUILDS the stream (plan construction needs no broker);
tests cover the file-based source, which shares the sink side.

Reference-semantics mapping (SURVEY.md §2.9):

- group mode (resume from committed offsets)  → checkpointLocation WAL;
  Spark never commits to Kafka — offsets live in the checkpoint, the
  idiomatic form of "store offset only after downstream delivery"
  (``kafka.go:288-293``, ``enable.auto.offset.store=false``)
- standalone mode (fresh UUID group, full replay, never commit)
  (``kafka.go:210,234-236``)                  → fresh checkpoint dir +
  ``startingOffsets=earliest`` + availableNow trigger
- ``isolation.level=read_committed`` (``kafka.go:407``) → same option
- ``max_records`` bound (``kafka.go:296-299``) → ``maxOffsetsPerTrigger``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from caterpillar_spark.streaming.apply import CHANGE_EVENT_SCHEMA


def parse_changelog_json(
    raw: DataFrame, schema: T.StructType = CHANGE_EVENT_SCHEMA
) -> DataFrame:
    """Kafka-shaped bytes -> change events: ``value`` (binary/string JSON)
    parsed against the pinned schema, broker partition id backfilling
    ``source_partition`` lineage when the payload lacks its own.

    Broker-independent (works on any DataFrame with value/partition
    columns), which is what makes the parse layer unit-testable in a
    broker-less sandbox; malformed JSON yields null fields that the
    quarantine operator downstream classifies rather than poisoning the
    run (the reference's fail_on_error trap, ``pipeline.go:240-250``)."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("e"),
        F.col("partition").alias("_kafka_partition"),
    ).select("e.*", "_kafka_partition")
    if "source_partition" in [f.name for f in schema.fields]:
        parsed = parsed.withColumn(
            "source_partition",
            F.coalesce(
                F.col("source_partition"),
                F.col("_kafka_partition").cast("int"),
            ),
        )
    return parsed.drop("_kafka_partition")


def stream_kafka_changelog(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    schema: T.StructType = CHANGE_EVENT_SCHEMA,
) -> DataFrame:
    """JSON change events from a Kafka topic, as the same shape
    ``stream_changelog`` yields — the sink side is source-agnostic.

    The Kafka partition id becomes ``source_partition`` lineage unless the
    payload carries its own.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("kafka.isolation.level", "read_committed")
        .option("failOnDataLoss", "true")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_changelog_json(reader.load(), schema)
