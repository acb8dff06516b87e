"""Generator invariants (FIXTURES.md §2): deterministic, insert-first,
strictly-increasing LSN, skewed."""

from __future__ import annotations

from pyspark.sql import functions as F

from caterpillar_spark.generator import GeneratorSpec, change_events

SPEC = GeneratorSpec(n_events=20_000, n_convs=100, turns_per_conv=10, seed=42)


def test_lsn_unique_and_dense(spark):
    df = change_events(spark, SPEC)
    agg = df.agg(
        F.count("*").alias("n"),
        F.countDistinct("lsn").alias("d"),
        F.min("lsn").alias("lo"),
        F.max("lsn").alias("hi"),
    ).collect()[0]
    assert agg["n"] == agg["d"] == SPEC.n_events
    assert agg["lo"] == 0 and agg["hi"] == SPEC.n_events - 1


def test_insert_before_update(spark):
    df = change_events(spark, SPEC)
    first_touch = df.groupBy("conv_id", "turn_idx").agg(
        F.min("lsn").alias("first_lsn"),
        F.min_by("op", "lsn").alias("first_op"),
    )
    # every key inside the inserted keyspace starts with I
    bad = first_touch.filter(
        (F.col("first_lsn") < SPEC.n_keys) & (F.col("first_op") != "I")
    ).count()
    assert bad == 0
    # keys first touched after the insert phase can only be UP (cold upsert)
    cold = first_touch.filter(F.col("first_lsn") >= SPEC.n_keys)
    assert cold.filter(F.col("first_op") != "UP").count() == 0


def test_deterministic_across_parallelism(spark):
    a = change_events(spark, SPEC).repartition(2)
    b = change_events(spark, SPEC).repartition(17)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_skew_exists(spark):
    df = change_events(spark, SPEC).filter(F.col("lsn") >= SPEC.n_keys)
    top = (
        df.groupBy("conv_id")
        .count()
        .orderBy(F.desc("count"))
        .limit(SPEC.n_hot)
        .agg(F.sum("count"))
        .collect()[0][0]
    )
    total = df.count()
    assert top / total > 0.35  # ~1% of convs should carry ~50% of updates


def test_delete_payload_null(spark):
    df = change_events(spark, SPEC)
    assert df.filter((F.col("op") == "D") & F.col("text").isNotNull()).count() == 0
    assert df.filter((F.col("op") != "D") & F.col("text").isNull()).count() == 0
