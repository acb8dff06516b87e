"""Plan-shape regression tests: pushdown, pruning, partial aggregation.
A correct answer from a bad plan is a 100-TB incident waiting; these make
plan shape part of the test suite (SURVEY.md §4.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from caterpillar_spark.plans import (
    has_partial_aggregate,
    pushed_filters,
    read_schema_columns,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    q = ev.filter(F.col("event_type") == "purchase").select("event_id")
    pf = pushed_filters(q)
    assert any("event_type" in f for f in pf), pf


def test_column_pruning(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    q = ev.select("event_id", "user_id")
    schemas = read_schema_columns(q)
    assert schemas and set(schemas[0]) == {"event_id", "user_id"}


def test_lww_agg_has_partial(spark, sf_dir):
    from caterpillar_spark.operators.dedup import last_writer_wins

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "event_id", "value"
    )
    q = last_writer_wins(ev, key=("user_id", "event_type"), lsn_col="event_id")
    assert has_partial_aggregate(q)


def test_lsn_range_filter_pushdown(spark, tmp_path):
    """Chunked replay reads prune by LSN range at the scan."""
    from caterpillar_spark.generator import GeneratorSpec, change_events

    spec = GeneratorSpec(n_events=5000, n_convs=20, turns_per_conv=5)
    change_events(spark, spec).write.mode("overwrite").parquet(
        str(tmp_path / "ev")
    )
    df = spark.read.parquet(str(tmp_path / "ev"))
    q = df.filter((F.col("lsn") >= 1000) & (F.col("lsn") < 2000))
    pf = pushed_filters(q)
    assert any("lsn" in f and "GreaterThanOrEqual" in f for f in pf), pf
