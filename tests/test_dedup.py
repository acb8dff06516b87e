"""All dedup strategies must agree with each other and with a pandas
reference reduction."""

from __future__ import annotations

from pyspark.sql import functions as F

from caterpillar_spark.generator import GeneratorSpec, change_events
from caterpillar_spark.operators.dedup import (
    last_writer_wins,
    last_writer_wins_pandas,
    last_writer_wins_salted,
    last_writer_wins_window,
)

SPEC = GeneratorSpec(n_events=10_000, n_convs=50, turns_per_conv=8, seed=7)


def _canon(df):
    return {tuple(r) for r in df.select(sorted(df.columns)).collect()}


def test_strategies_agree(spark):
    ev = change_events(spark, SPEC)
    base = _canon(last_writer_wins(ev))
    assert base == _canon(last_writer_wins_window(ev))
    assert base == _canon(last_writer_wins_salted(ev, n_salts=8))
    assert base == _canon(last_writer_wins_pandas(ev))


def test_matches_pandas_reference(spark):
    ev = change_events(spark, SPEC)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["lsn"], r["text"])
        for r in last_writer_wins(ev).collect()
    }
    pdf = ev.toPandas()
    ref = pdf.loc[pdf.groupby(["conv_id", "turn_idx"])["lsn"].idxmax()]
    want = {
        (r.conv_id, r.turn_idx): (r.lsn, None if r.text != r.text else r.text)
        for r in ref.itertuples()
    }
    # normalize pandas NaN -> None handled above; texts may be None for D
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in want.items()}
    assert {k: v[1] for k, v in got.items()} == {k: v[1] for k, v in want.items()}


def test_keeps_delete_winners(spark):
    ev = change_events(spark, SPEC)
    lww = last_writer_wins(ev)
    n_del = lww.filter(F.col("op") == "D").count()
    assert n_del > 0  # deletes survive dedup (merge needs them)


def test_one_row_per_key(spark):
    ev = change_events(spark, SPEC)
    lww = last_writer_wins(ev)
    assert lww.count() == lww.select("conv_id", "turn_idx").distinct().count()
