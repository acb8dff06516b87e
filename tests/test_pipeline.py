"""Declarative pipeline composition: YAML config → one Catalyst plan.
Mirrors the reference's hello_name.yaml / DAG fan-out fixtures."""

from __future__ import annotations

import pytest

from caterpillar_spark.pipeline import Pipeline


@pytest.fixture()
def names_parquet(spark, tmp_path):
    p = str(tmp_path / "names")
    spark.createDataFrame(
        [("ana maria",), ("bob lee",), ("cyd x",)], ["name"]
    ).write.mode("overwrite").parquet(p)
    return p


def test_linear_pipeline(spark, names_parquet, tmp_path):
    """hello_name.yaml analogue: source → split → filter → sink."""
    out = str(tmp_path / "out")
    yaml_text = f"""
pipeline:
  - name: read
    type: source
    format: parquet
    path: {names_parquet}
  - name: words
    type: split
    col: name
    delim: " "
    out: word
  - name: keep_long
    type: filter
    expr: "length(word) >= 3"
  - name: proj
    type: select
    exprs: ["upper(word) AS word"]
  - name: out
    type: sink
    format: parquet
    path: {out}
"""
    Pipeline.from_yaml(spark, yaml_text).run()
    got = {r["word"] for r in spark.read.parquet(out).collect()}
    assert got == {"ANA", "MARIA", "BOB", "LEE", "CYD"}


def test_dag_fanout_union(spark, names_parquet):
    """DAG broadcast fan-out + interleave fan-in (pipeline.go:183-227):
    both branches see every input record; output is the union."""
    cfg = {
        "pipeline": [
            {"type": "source", "format": "parquet", "path": names_parquet},
            {
                "type": "branches",
                "branches": [
                    [{"type": "select", "exprs": ["name", "'upper' AS branch"]}],
                    [{"type": "select", "exprs": ["name", "'lower' AS branch"]}],
                ],
            },
        ]
    }
    df = Pipeline.from_config(spark, cfg).build()
    assert df.count() == 6  # 3 records × 2 branches
    assert df.select("branch").distinct().count() == 2


def test_unknown_op_fails_at_build(spark):
    with pytest.raises(ValueError, match="unknown op type"):
        Pipeline.from_config(
            spark, {"pipeline": [{"type": "frobnicate", "name": "x"}]}
        )


def test_registry_op_invocation(spark, names_parquet):
    cfg = {
        "pipeline": [
            {"type": "source", "format": "parquet", "path": names_parquet},
            {"type": "replace", "col": "name", "pattern": "a", "repl": "@"},
        ]
    }
    df = Pipeline.from_config(spark, cfg).build()
    assert {r["name"] for r in df.collect()} == {"@n@ m@ri@", "bob lee", "cyd x"}


def test_late_filter_pushes_down(spark, names_parquet):
    """The whole pipeline is ONE Catalyst plan: a filter declared last
    still reaches the parquet scan (the reference executes its DAG
    verbatim; ours optimizes globally)."""
    from caterpillar_spark.plans import pushed_filters

    cfg = {
        "pipeline": [
            {"type": "source", "format": "parquet", "path": names_parquet},
            {"type": "with_column", "name": "tag", "expr": "1"},
            {"type": "filter", "expr": "name = 'bob lee'"},
        ]
    }
    df = Pipeline.from_config(spark, cfg).build()
    assert any("name" in f for f in pushed_filters(df))
