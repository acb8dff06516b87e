"""Declarative pipeline composition — the Spark-first replacement for the
reference's YAML task pipelines (``internal/pkg/pipeline/pipeline.go:51-99``
and the DAG grammar, ``dag.go:50-100``).

A pipeline is data: a source, a list of op invocations, an optional sink.
Ops resolve from the engine registry (``operators.register`` — the analogue
of ``supportedTasks``, ``tasks.go:37-59``). Unknown op name = hard error at
BUILD time, like the reference's unknown-task-type error (``tasks.go:78-81``).

Where the reference runs each task as goroutines wired by channels, here
composition is plan construction: the whole pipeline becomes ONE Catalyst
plan, so filters written late still push down to the scan and the DAG's
fan-out/fan-in optimize globally — the reference executes its DAG verbatim
(SURVEY.md §4.1); ours is optimized as a unit.

YAML form (mirrors the reference's config shape)::

    pipeline:
      - name: read
        type: source
        format: parquet
        path: /data/documents.parquet
      - name: words
        type: split
        col: text
        delim: " "
        out: word
      - name: keep_long
        type: filter
        expr: "length(word) > 3"
      - name: out
        type: sink
        format: parquet
        path: /out/words

Fan-out/fan-in (the reference's ``dag: [a > b, a > c] > d`` broadcast +
interleave, ``pipeline.go:183-227``): use ``branches:`` — each branch gets
the same input DataFrame (plan reuse = the broadcast copy) and outputs
union by name (the merge).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from caterpillar_spark.operators import REGISTRY

# built-in step types beyond registry ops
_CORE_TYPES = {"source", "sink", "filter", "select", "with_column", "branches"}


@dataclass
class Pipeline:
    spark: SparkSession
    steps: list[dict[str, Any]] = field(default_factory=list)

    @classmethod
    def from_yaml(cls, spark: SparkSession, text: str) -> "Pipeline":
        import yaml

        cfg = yaml.safe_load(text)
        return cls.from_config(spark, cfg)

    @classmethod
    def from_config(cls, spark: SparkSession, cfg: dict) -> "Pipeline":
        steps = cfg["pipeline"]
        for s in steps:
            t = s.get("type")
            if t not in _CORE_TYPES and t not in REGISTRY:
                raise ValueError(
                    f"unknown op type {t!r} in step {s.get('name', '?')}; "
                    f"known: {sorted(_CORE_TYPES | set(REGISTRY))}"
                )  # mirrors tasks.go:78-81
        return cls(spark, steps)

    # ---------------------------------------------------------------- run
    def build(self, df: DataFrame | None = None) -> DataFrame:
        """Compose the steps into one DataFrame plan (no execution)."""
        for step in self.steps:
            df = self._apply(step, df)
        if df is None:
            raise ValueError("pipeline produced no DataFrame (no source?)")
        return df

    def run(self) -> DataFrame | None:
        """Build and, if the last step is a sink, execute the write."""
        *steps, last = self.steps
        df = None
        for step in steps:
            df = self._apply(step, df)
        if last.get("type") == "sink":
            self._sink(last, df)
            return None
        return self._apply(last, df)

    def _apply(self, step: dict, df: DataFrame | None) -> DataFrame:
        t = step["type"]
        if t == "source":
            fmt = step.get("format", "parquet")
            reader = self.spark.read.format(fmt)
            for k, v in step.get("options", {}).items():
                reader = reader.option(k, v)
            if "schema" in step:
                reader = reader.schema(step["schema"])
            return reader.load(step["path"])
        if df is None:
            raise ValueError(f"step {step.get('name', t)} has no input")
        if t == "sink":
            self._sink(step, df)
            return df
        if t == "filter":
            return df.filter(F.expr(step["expr"]))
        if t == "select":
            return df.selectExpr(*step["exprs"])
        if t == "with_column":
            return df.withColumn(step["name"], F.expr(step["expr"]))
        if t == "branches":
            outs = []
            for branch in step["branches"]:
                sub = Pipeline(self.spark, branch)
                outs.append(sub.build(df))  # plan reuse = broadcast fan-out
            return reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), outs
            )
        # registry op: remaining keys (minus name/type) are kwargs
        kwargs = {k: v for k, v in step.items() if k not in ("name", "type")}
        return REGISTRY[t](df, **kwargs)

    def _sink(self, step: dict, df: DataFrame) -> None:
        w = df.write.mode(step.get("mode", "overwrite"))
        if step.get("partition_by"):
            w = w.partitionBy(*step["partition_by"])
        for k, v in step.get("options", {}).items():
            w = w.option(k, v)
        w.format(step.get("format", "parquet")).save(step["path"])
