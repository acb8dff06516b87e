"""Per-record transform operators — the Spark forms of the reference's
``jq`` / ``replace`` / ``split`` / ``flatten`` / ``join`` tasks. All pure
Column expressions (whole-stage codegen); nothing here touches Python
per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from caterpillar_spark.operators import register


@register("split")
def split_explode(
    df: DataFrame, col: str, delim: str = "\n", out: str = "part"
) -> DataFrame:
    """``split`` task (task/split/split.go:24-38): payload → N records on a
    delimiter, trailing-empty trimmed (Go strings.Split keeps no trailing
    element because the reference trims the final delimiter first)."""
    parts = F.split(F.col(col), F.lit(delim), -1)
    # trim one trailing empty element, as the reference trims a trailing delim
    parts = F.when(
        F.element_at(parts, -1) == "", F.slice(parts, 1, F.size(parts) - 1)
    ).otherwise(parts)
    return df.withColumn(out, F.explode(parts))


@register("replace")
def regex_replace(df: DataFrame, col: str, pattern: str, repl: str) -> DataFrame:
    """``replace`` task (task/replace/replace.go:20-38): regex find/replace,
    capture groups $1 — same syntax in Spark's regexp_replace."""
    return df.withColumn(col, F.regexp_replace(F.col(col), pattern, repl))


def _flatten_inner(schema: T.StructType, path: str) -> list[tuple[Column, str]]:
    """Recursive struct flatten, keys joined with '_' — mirrors the flatten
    task's separator semantics (task/flatten/flatten.go:51-66); arrays kept
    intact like the reference keeps arrays unflattened."""
    out: list[tuple[Column, str]] = []
    for f in schema.fields:
        child_path = f"{path}.{f.name}"
        alias = child_path.replace(".", "_")
        if isinstance(f.dataType, T.StructType):
            out.extend(_flatten_inner(f.dataType, child_path))
        else:
            out.append((F.col(child_path), alias))
    return out


@register("flatten")
def flatten(df: DataFrame, include_original: bool = False) -> DataFrame:
    """``flatten`` task (task/flatten/flatten.go:19-66): nested structs →
    one level, names underscore-joined; arrays left intact."""
    cols: list[Column] = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            if include_original:
                cols.append(F.col(f.name))
            cols.extend(c.alias(a) for c, a in _flatten_inner(f.dataType, f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


@register("json_project")
def json_project(df: DataFrame, col: str, paths: dict[str, str]) -> DataFrame:
    """The ``jq`` task's projection core (task/jq/jq.go:23-74): extract
    JSON-path values from a JSON-string column into typed columns."""
    return df.select(
        "*", *[F.get_json_object(F.col(col), p).alias(a) for a, p in paths.items()]
    )


@register("xpath")
def xpath_extract(
    df: DataFrame, col: str, paths: dict[str, str], as_array: bool = False
) -> DataFrame:
    """``xpath`` task (task/xpath/xpath.go:30-107): extract values from an
    XML-string column by XPath. Spark ships Hive's xpath UDFs JVM-side
    (``xpath_string`` scalar / ``xpath`` node-list) — no Python, no lxml;
    the per-record goquery walk in the reference becomes codegen here.

    ``paths``: output column -> XPath. ``as_array`` extracts every match
    as ``array<string>`` (the reference emits one record per match; chain
    ``F.explode`` for that shape)."""
    fn = F.xpath if as_array else F.xpath_string
    return df.select(
        "*", *[fn(F.col(col), F.lit(p)).alias(a) for a, p in paths.items()]
    )


@register("concat_batch")
def concat_group(
    df: DataFrame, group: list[str], order: str, col: str, delim: str
) -> DataFrame:
    """``join`` task (task/join/join.go:41-107): concatenate records with a
    delimiter. Distributed form: per-group ordered concat — collect_list is
    unordered, so sort structs first (deterministic)."""
    agg = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(order), F.col(col)))),
            lambda s: s[col],
        ),
        delim,
    ).alias("joined")
    return df.groupBy(*group).agg(agg)
