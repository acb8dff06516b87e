"""Payload-column compress/decompress — the reference's ``compress`` task
codes each record's payload bytes mid-stream, independent of any file
format (``internal/pkg/pipeline/task/compress/compress.go:50-131``;
formats gzip + framed snappy, ``formats.go:16-31``). This is distinct
from the file-level codec option on the parquet/text sinks
(``sources/files.py``): here the codec output IS the column value.

Spark-first mapping: a vectorized Arrow-batched pandas UDF over the
``binary`` column (stdlib ``gzip``; ``snappy`` import-gated — the framed
stream format, matching the reference's ``snappy.NewBufferedWriter``).
Reference record semantics preserved by :func:`compress_records`:
empty/null payloads are skipped, as are empty codec outputs
(``compress.go:62-64,79-81``).

Certified-path determinism: gzip output embeds NO timestamp (``mtime=0``)
so the same payload always codes to the same bytes on every run and
executor.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

from caterpillar_spark.operators import register

FORMATS = ("gzip", "snappy")
ACTIONS = ("compress", "decompress")


def _snappy_or_raise():
    try:
        import snappy  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover — sandbox has no snappy
        raise RuntimeError(
            "snappy payload codec needs the 'python-snappy' package "
            "(pip install python-snappy); gzip needs nothing"
        ) from e
    return snappy


def _codec(fmt: str, action: str) -> Callable[[bytes], bytes]:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported value for field 'format': {fmt!r}")
    if action not in ACTIONS:
        raise ValueError(f"unsupported value for field 'action': {action!r}")
    if fmt == "gzip":
        if action == "compress":
            return lambda b: gzip.compress(b, mtime=0)
        return gzip.decompress

    # framed snappy stream (ref: snappy.NewBufferedWriter / NewReader).
    # Gate DRIVER-side so a missing package is a clean config error, not
    # an executor-task stack trace.
    _snappy_or_raise()

    def _sc(b: bytes) -> bytes:
        import snappy  # type: ignore[import-not-found]

        dst = io.BytesIO()
        snappy.stream_compress(io.BytesIO(b), dst)
        return dst.getvalue()

    def _sd(b: bytes) -> bytes:
        import snappy  # type: ignore[import-not-found]

        dst = io.BytesIO()
        snappy.stream_decompress(io.BytesIO(b), dst)
        return dst.getvalue()

    return _sc if action == "compress" else _sd


def codec_column(col: Column | str, fmt: str = "gzip", action: str = "compress") -> Column:
    """Column expression: codec the binary payload element-wise (null in ->
    null out). Arrow-batched pandas UDF — bytes never cross row-at-a-time.
    Validates format/action DRIVER-side (clean error, ref UnmarshalYAML
    parity) before any job runs."""
    fn = _codec(fmt, action)

    @pandas_udf(BinaryType())
    def _k(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else fn(bytes(b)))

    return _k(F.col(col) if isinstance(col, str) else col)


@register("compress")
def compress_records(
    df: DataFrame,
    col: str = "data",
    fmt: str = "gzip",
    action: str = "compress",
    out_col: str | None = None,
) -> DataFrame:
    """The reference task verbatim, as a DataFrame op: skip empty/null
    payloads, codec the rest, skip empty outputs. ``out_col=None``
    replaces the column in place (the reference rewrites record.Data)."""
    out = out_col or col
    coded = df.filter(
        F.col(col).isNotNull() & (F.length(F.col(col)) > 0)
    ).withColumn(out, codec_column(col, fmt, action))
    return coded.filter(F.length(F.col(out)) > 0)
