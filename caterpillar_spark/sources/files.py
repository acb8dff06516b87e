"""File sources/sinks — the Spark form of the reference's ``file`` task and
``converter: csv`` (``task/file/file.go:98-210``, ``task/converter/csv.go``).

Mappings:

- ``**`` doublestar glob + per-file record         → ``spark.read.load(glob)``;
  Spark globs natively; ``recursiveFileLookup`` covers ``**`` semantics.
- slugified source filename stamped into context   → ``_source_file`` column
  from ``input_file_name()`` (lineage column, not a side channel).
- CSV header slugification / auto colN / is_numeric coercion
  (``csv.go:88-136``)                              → explicit rename + cast
  after a header read; we pin schemas, inference only in dev.
- templated per-record output paths (``file.go:161-210``) → ``partitionBy``
  columns (the distributed version of a path template).
- ``_SUCCESS`` marker (``file.go:212-252``)        → Spark writes it natively.
- ``compress`` task (gzip/snappy)                  → ``option("compression")``
  on the format — a codec option, not an operator.

Kafka source/sink intentionally live behind the same call shape in
``caterpillar_spark.streaming`` (swap ``stream_changelog`` for
``readStream.format("kafka")``); no broker exists in the sandbox.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def slugify_expr(col: Column) -> Column:
    """Lowercase, non-alphanumerics collapsed to ``_`` — mirrors the
    reference's slug convention for filenames and CSV headers
    (``task/converter/csv.go:96-104``)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"[^a-z0-9]+", "_")


def _slugify(name: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", name.strip().lower())


def read_files(
    spark: SparkSession,
    path_glob: str,
    fmt: str = "text",
    whole: bool = False,
    **options,
) -> DataFrame:
    """Read files by glob with the source path stamped as a lineage column.

    ``whole=True`` gives one record per file (the reference's file-source
    granularity, ``file.go:98-159``) via ``wholetext``/``binaryFile``;
    otherwise records are rows/lines (the scalable default)."""
    if whole and fmt == "text":
        df = spark.read.option("wholetext", "true").text(path_glob)
    elif whole:
        df = spark.read.format("binaryFile").load(path_glob)
        return df.withColumn("_source_file", F.col("path"))
    else:
        df = spark.read.format(fmt).options(**options).load(path_glob)
    return df.withColumn("_source_file", F.input_file_name())


def read_csv_records(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    numeric_columns: list[str] | None = None,
    skip_header_slug: bool = False,
    **options,
) -> DataFrame:
    """CSV → typed records, reference-converter semantics:

    - explicit ``columns`` win (``csv.go:27-45``);
    - else header names, slugified (``csv.go:88-115``); BOM on the first
      header cell is stripped by Spark's CSV reader;
    - ``numeric_columns`` get the is_numeric coercion (long, falling back
      to double — ``csv.go:117-136``), here an explicit cast.
    """
    opts = {"header": "false" if columns else "true", "quote": '"', **options}
    df = spark.read.options(**opts).csv(path)
    if columns:
        df = df.toDF(*columns)
    elif not skip_header_slug:
        df = df.toDF(*[_slugify(c) for c in df.columns])
    for c in numeric_columns or []:
        # ANSI-safe numeric coercion (csv.go:117-136). The reference emits
        # int64 when exact else float64 per VALUE; a typed column can't mix,
        # so the engine-correct form is one double column (IDs that must
        # stay exact belong in an explicit LongType schema, per SURVEY.md
        # §1.2 precision rule — never round-tripped through doubles).
        df = df.withColumn(c, F.col(c).try_cast("double"))
    return df


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines (the reference's implicit record format)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_json_array(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """A single top-level JSON array file (e.g. the reference's
    ``greetings.json`` fixture) — multiLine mode."""
    r = spark.read.option("multiLine", "true")
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_records(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_cols: list[str] | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """File sink: partitionBy columns replace the reference's per-record
    path templating; Spark writes the ``_SUCCESS`` marker natively."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if compression:
        w = w.option("compression", compression)
    w.format(fmt).save(path)
