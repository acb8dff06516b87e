from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from caterpillar_spark.operators.quarantine import quarantine_to, validate_change_events

SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

TS = dt.datetime(2024, 1, 1)
ROWS = [
    (0, "I", "c0", 0, "user", "hello", None, TS),  # valid
    (None, "I", "c0", 1, "user", "x", None, TS),  # bad_lsn
    (2, "Z", "c0", 2, "user", "x", None, TS),  # bad_op
    (3, "U", None, 0, "user", "x", None, TS),  # null_key
    (4, "U", "c1", 0, "user", None, None, TS),  # null_payload
    (5, "D", "c1", 1, None, None, None, TS),  # valid (delete, null payload ok)
    (6, None, "c2", 0, "user", "x", None, TS),  # bad_op (NULL op: 3VL trap —
    # ~isin() is NULL, not true, so it must be caught explicitly)
]


def test_validate_split(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    split = validate_change_events(df)
    assert {r["lsn"] for r in split.valid.collect()} == {0, 5}
    reasons = {
        r["lsn"]: r["_reject_reason"] for r in split.quarantined.collect()
    }
    assert reasons == {
        None: "bad_lsn",
        2: "bad_op",
        3: "null_key",
        4: "null_payload",
        6: "bad_op",
    }


def test_quarantine_to_sidecar(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    qdir = str(tmp_path / "quarantine")
    valid = quarantine_to(df, qdir)
    assert valid.count() == 2
    side = spark.read.parquet(qdir)
    assert side.count() == 5
    assert "_reject_reason" in side.columns
    # appends accumulate (at-least-once side channel, never data loss)
    quarantine_to(df, qdir)
    assert spark.read.parquet(qdir).count() == 10
