"""Payload-column codec op (reference task/compress/compress.go:50-131):
gzip roundtrip through Arrow-batched pandas UDFs, reference skip-empty
semantics, deterministic output, clean gates for snappy/bad config."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from caterpillar_spark.operators.compress import (
    codec_column,
    compress_records,
)


@pytest.fixture(scope="module")
def payloads(spark):
    return spark.createDataFrame(
        [
            (1, b"hello caterpillar"),
            (2, b"x" * 10_000),  # compressible
            (3, None),  # null payload -> skipped by compress_records
            (4, b""),  # empty payload -> skipped (compress.go:62-64)
            (5, "unicode ☃ payload".encode()),
        ],
        "id int, data binary",
    )


def test_gzip_roundtrip(payloads):
    packed = compress_records(payloads, col="data", out_col="z")
    unpacked = compress_records(packed, col="z", action="decompress", out_col="u")
    rows = {r["id"]: bytes(r["u"]) for r in unpacked.collect()}
    assert rows == {
        1: b"hello caterpillar",
        2: b"x" * 10_000,
        5: "unicode ☃ payload".encode(),
    }


def test_skip_empty_records_parity(payloads):
    """null and zero-length payloads are DROPPED, not nulled — the
    reference `continue`s past them."""
    packed = compress_records(payloads, col="data")
    assert sorted(r["id"] for r in packed.collect()) == [1, 2, 5]


def test_gzip_output_is_deterministic(payloads):
    """Certified-path rule: mtime=0 means same payload -> same bytes on
    every run (plain gzip.compress embeds the wall clock)."""
    a = {r["id"]: bytes(r["z"]) for r in
         compress_records(payloads, col="data", out_col="z").collect()}
    b = {r["id"]: bytes(r["z"]) for r in
         compress_records(payloads, col="data", out_col="z").collect()}
    assert a == b
    # and interoperable with stock gzip
    assert gzip.decompress(a[1]) == b"hello caterpillar"


def test_compresses_in_place_by_default(payloads):
    packed = compress_records(payloads, col="data")
    assert packed.columns == ["id", "data"]
    row = {r["id"]: bytes(r["data"]) for r in packed.collect()}
    assert gzip.decompress(row[2]) == b"x" * 10_000
    assert len(row[2]) < 200  # actually compressed


def test_codec_column_null_passthrough(payloads):
    out = payloads.select("id", codec_column("data").alias("z")).collect()
    z = {r["id"]: r["z"] for r in out}
    assert z[3] is None
    assert z[4] is not None  # gzip of b"" is a valid (non-empty) stream


def test_bad_config_raises_driver_side(payloads):
    with pytest.raises(ValueError, match="format"):
        compress_records(payloads, col="data", fmt="zstd")
    with pytest.raises(ValueError, match="action"):
        compress_records(payloads, col="data", action="explode")


def test_snappy_gated_or_roundtrips(payloads):
    try:
        import snappy  # noqa: F401

        have = True
    except ImportError:
        have = False
    if not have:
        # the gate fires driver-side, before any job runs
        with pytest.raises(RuntimeError, match="python-snappy"):
            compress_records(payloads, col="data", fmt="snappy")
    else:  # pragma: no cover — sandbox has no snappy
        packed = compress_records(payloads, col="data", fmt="snappy", out_col="z")
        unpacked = compress_records(
            packed, col="z", fmt="snappy", action="decompress", out_col="u"
        )
        assert {r["id"]: bytes(r["u"]) for r in unpacked.collect()}[1] == b"hello caterpillar"
