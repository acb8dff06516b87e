"""Parameter-store sink/source (aws_parameter_store parity) with a fake
2-method client."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.sources.param_store import (
    get_parameters,
    publish_parameters,
    put_parameters,
)


class FakeSSM:
    def __init__(self):
        self.store: dict[str, str] = {}
        self.calls: list[tuple] = []

    def put_parameter(self, name, value, secure=True, overwrite=True):
        if not overwrite and name in self.store:
            raise RuntimeError("ParameterAlreadyExists")
        self.calls.append((name, value, secure, overwrite))
        self.store[name] = value

    def get_parameter(self, name):
        return self.store[name]


def test_put_and_get_roundtrip():
    c = FakeSSM()
    put_parameters(c, {"/app/watermark": "123", "/app/run": "r1"})
    assert c.store["/app/watermark"] == "123"
    # secure by default, overwrite by default (parameter_store.go:31-34)
    assert all(secure and over for (_, _, secure, over) in c.calls)
    got = get_parameters(c, {"wm": "/app/watermark"})
    assert got == {"wm": "123"}


def test_put_rejects_non_string():
    c = FakeSSM()
    with pytest.raises(TypeError, match="not string"):
        put_parameters(c, {"/app/x": 42})


def test_no_overwrite_respected():
    c = FakeSSM()
    put_parameters(c, {"/a": "1"})
    with pytest.raises(RuntimeError, match="AlreadyExists"):
        put_parameters(c, {"/a": "2"}, overwrite=False)


def test_publish_df_parameters(spark):
    c = FakeSSM()
    df = spark.range(5).agg(
        F.max("id").alias("mx"), F.count("*").alias("n")
    )
    n = publish_parameters(
        c, df, {"/app/max_lsn": "mx", "/app/rows": F.col("n")}
    )
    assert n == 2
    assert c.store["/app/max_lsn"] == "4"
    assert c.store["/app/rows"] == "5"


def test_publish_rejects_bulk_df(spark):
    c = FakeSSM()
    big = spark.range(2000).withColumn("v", F.col("id").cast("string"))
    with pytest.raises(ValueError, match="aggregate first"):
        publish_parameters(c, big, {"/app/v": "v"})
