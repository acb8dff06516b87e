"""Plan-inspection helpers: assert the physical plan is the one we want
(pushdown reached the scan, aggregation has a map-side partial, column
pruning happened). The reference has no optimizer to inspect
(``pipeline.go:51-99`` executes the task list verbatim); for us Catalyst
does the work and these helpers make its output testable so regressions in
plan shape fail CI, not production."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries on every scan node."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    txt = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        schemas.append(cols)
    return schemas


def has_partial_aggregate(df: DataFrame) -> bool:
    """True if the plan splits aggregation into partial + final (map-side
    combine before the shuffle — the built-in skew defuser)."""
    txt = explain_str(df)
    return "partial_" in txt
