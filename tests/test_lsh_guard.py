"""Hot-bucket guard: a planted degenerate LSH bucket must not go quadratic.

The guard (operators/lsh.py) drops buckets above a size cap before the
within-bucket self-join — the production mitigation for boilerplate/empty
text and zero-vector pile-ups at web scale (VERDICT r5 what's-wrong #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucket_cap_math():
    from caterpillar_spark.operators.lsh import bucket_cap_for, resolve_cap

    assert bucket_cap_for(0) == 1024
    assert bucket_cap_for(500) == 1024  # floor: never fires at oracle scale
    assert bucket_cap_for(10**9) == 4 * 31622
    assert resolve_cap(None, lambda: 1 / 0) is None  # disabled: no count job
    assert resolve_cap(17, lambda: 1 / 0) == 17
    assert resolve_cap("auto", lambda: 500) == 1024


def test_drop_hot_buckets_kept_and_oversized(spark):
    from caterpillar_spark.operators.lsh import drop_hot_buckets

    rows = [("hot", i) for i in range(30)] + [("cold", i) for i in range(3)]
    df = spark.createDataFrame(rows, ["band_key", "id"]).withColumn(
        "band_idx", F.lit(0)
    )
    kept, oversized = drop_hot_buckets(df, ["band_idx", "band_key"], cap=10)
    assert kept.count() == 3
    over = oversized.collect()
    assert len(over) == 1
    assert over[0]["band_key"] == "hot" and over[0]["bucket_rows"] == 30


def test_minhash_lsh_degenerate_bucket_bounded(spark):
    from caterpillar_spark.operators.docs import minhash_lsh_pairs

    # 40 byte-identical boilerplate docs -> every band routes them into one
    # bucket; ungated that is 40*39/2 = 780 candidate pairs from garbage.
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 3
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    rows = [(i, boiler) for i in range(100, 140)] + [(1, base), (2, near)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    ungated = minhash_lsh_pairs(df, max_bucket=None)
    assert ungated.count() >= 780  # quadratic blow-up exists without a guard

    gated = minhash_lsh_pairs(df, max_bucket=10, with_drop_stats=True)
    got = gated.collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (1, 2) in pairs  # honest near-dup survives
    assert not any(a >= 100 and b >= 100 for a, b in pairs)  # boilerplate gone
    assert all(r["dropped_buckets"] >= 1 for r in got)


def test_minhash_lsh_drop_stats_zero_when_disabled(spark):
    from caterpillar_spark.operators.docs import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff"), (2, "gg hh ii jj kk ll")], ["doc_id", "text"]
    )
    out = minhash_lsh_pairs(df, max_bucket=None, with_drop_stats=True)
    assert "dropped_buckets" in out.columns
    assert all(r["dropped_buckets"] == 0 for r in out.collect())


def test_cosine_neardup_degenerate_bucket_bounded(spark):
    from caterpillar_spark.operators.similarity import cosine_neardup_pairs

    dim = 8
    zeroish = [1.0] + [0.0] * (dim - 1)  # 40 identical vectors: one bucket
    a = [0.0, 1.0] + [0.0] * (dim - 2)
    b = [0.01, 1.0] + [0.0] * (dim - 2)
    rows = [(i, zeroish) for i in range(100, 140)] + [(1, a), (2, b)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    # n_tables=2: even if one table routes the honest pair into the same
    # bucket as the degenerate pile (and loses it to the drop), the second
    # independent plane set recovers it — the OR-amplification recall story.
    gated = cosine_neardup_pairs(
        emb, threshold=0.9, n_planes=4, dim=dim, n_tables=2, max_bucket=10
    )
    pairs = {(r["id_a"], r["id_b"]) for r in gated.collect()}
    assert (1, 2) in pairs
    assert not any(x >= 100 and y >= 100 for x, y in pairs)

    ungated = cosine_neardup_pairs(
        emb, threshold=0.9, n_planes=4, dim=dim, n_tables=2, max_bucket=None
    )
    assert ungated.count() >= 780 + 1


def test_auto_cap_does_not_fire_at_test_scale(spark):
    from caterpillar_spark.operators.docs import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    df = spark.createDataFrame([(1, base), (2, near)], ["doc_id", "text"])
    default = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(df).collect()}
    off = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, max_bucket=None).collect()
    }
    assert default == off == {(1, 2)}
