"""Unit tests for the transform/sampling/function operators (the oracle
harness covers value parity vs DuckDB; these cover semantics the oracle
can't — trailing-delim trim, nested flatten, hmac vs hashlib, etc.)."""

from __future__ import annotations

import hashlib
import hmac as hmac_mod

from pyspark.sql import Row
from pyspark.sql import functions as F

from caterpillar_spark.functions import hmac_sha256, shared_hash64
from caterpillar_spark.operators.sampling import head, nth, tail
from caterpillar_spark.operators.text import (
    concat_group,
    flatten,
    json_project,
    split_explode,
)


def test_split_trims_trailing_delimiter(spark):
    df = spark.createDataFrame([("a\nb\nc\n",), ("x\ny",)], ["payload"])
    out = split_explode(df, "payload", "\n", out="line")
    lines = [r["line"] for r in out.collect()]
    assert sorted(lines) == ["a", "b", "c", "x", "y"]  # no trailing ""


def test_flatten_nested_structs(spark):
    df = spark.createDataFrame(
        [Row(id=1, user=Row(uid=7, company=Row(name="acme")), tags=["x"])]
    )
    out = flatten(df)
    assert set(out.columns) == {"id", "user_uid", "user_company_name", "tags"}
    r = out.collect()[0]
    assert r["user_uid"] == 7 and r["user_company_name"] == "acme"
    assert r["tags"] == ["x"]  # arrays kept intact


def test_json_project(spark):
    df = spark.createDataFrame([('{"a": {"b": 5}, "c": "x"}',)], ["js"])
    out = json_project(df, "js", {"ab": "$.a.b", "c": "$.c"})
    r = out.collect()[0]
    assert r["ab"] == "5" and r["c"] == "x"


def test_concat_group_ordered(spark):
    df = spark.createDataFrame(
        [("g", 2, "b"), ("g", 1, "a"), ("g", 3, "c"), ("h", 1, "z")],
        ["grp", "ord", "val"],
    )
    out = {r["grp"]: r["joined"] for r in concat_group(df, ["grp"], "ord", "val", "-").collect()}
    assert out == {"g": "a-b-c", "h": "z"}


def test_head_tail_nth(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    assert [r["k"] for r in head(df, "k", 5).collect()] == [0, 1, 2, 3, 4]
    assert [r["k"] for r in tail(df, "k", 3).collect()] == [97, 98, 99]
    assert [r["k"] for r in nth(df, "k", 25).collect()] == [0, 25, 50, 75]


def test_hash_sampling_deterministic(spark):
    import hashlib as _hl

    from caterpillar_spark.operators.sampling import percent_hash, random_n_hash

    df = spark.range(1000).select(F.col("id").alias("k"))
    kept = sorted(r["k"] for r in percent_hash(df, "k", 10.0).collect())
    # pure function of the key: recompute the expected set with hashlib
    expect = sorted(
        i for i in range(1000)
        if _hl.md5(str(i).encode()).hexdigest()[:8] < "19999999"
    )
    assert kept == expect
    assert kept == sorted(r["k"] for r in percent_hash(df, "k", 10.0).collect())
    # salt rotates the sample without changing its size distribution
    salted = sorted(r["k"] for r in percent_hash(df, "k", 10.0, salt="s1").collect())
    assert salted != kept
    # boundary pcts
    assert percent_hash(df, "k", 0.0).count() == 0
    assert percent_hash(df, "k", 100.0).count() == 1000
    import pytest as _pt

    with _pt.raises(ValueError):
        percent_hash(df, "k", 101.0)

    top = random_n_hash(df, "k", 50)
    got = sorted(r["k"] for r in top.collect())
    expect_n = sorted(
        sorted(range(1000), key=lambda i: _hl.md5(str(i).encode()).hexdigest())[:50]
    )
    assert got == expect_n


def test_hmac_matches_stdlib(spark):
    df = spark.createDataFrame([("k1", "hello"), ("k2", "world")], ["k", "m"])
    got = {
        (r["k"], r["m"]): r["mac"]
        for r in df.select("k", "m", hmac_sha256(F.col("k"), F.col("m")).alias("mac")).collect()
    }
    for (k, m), mac in got.items():
        assert mac == hmac_mod.new(k.encode(), m.encode(), hashlib.sha256).hexdigest()


def test_shared_hash64_stable(spark):
    df = spark.createDataFrame([("abc",)], ["s"]).select(shared_hash64("s").alias("h"))
    # must equal DuckDB's CAST('0x'||substr(md5('abc'),1,15) AS BIGINT)
    assert df.collect()[0]["h"] == 648541476951500027


def test_multimodal_plumbing(spark):
    from caterpillar_spark.operators.multimodal import (
        extract_features,
        frame_sample,
        synth_media,
    )

    media = synth_media(spark, 30)
    feats = extract_features(media, feat_dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-5  # normalized histogram
    frames = frame_sample(media, every_ms=1000)
    # only videos explode; every video of duration d ms yields ceil(d/1000) rows
    vids = media.filter(F.col("kind") == "video").collect()
    expect = sum((v["duration_ms"] + 999) // 1000 for v in vids)
    assert frames.count() == expect


def test_simhash_bits_bounded(spark, sf_dir):
    from caterpillar_spark.operators.docs import simhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = simhash(docs, bits=16)
    mx = out.agg(F.max("simhash"), F.min("simhash")).collect()[0]
    assert 0 <= mx[1] and mx[0] < 2**16


def test_minhash_lsh_finds_planted_neardups(spark):
    from caterpillar_spark.operators.docs import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different words entirely unrelated content here " * 5
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_sample_nth_registry_points_at_keyed_form():
    """`sample_nth` in the op registry must be the pushdown-friendly keyed
    filter (r6 promotion); the global-window positional form stays reachable
    under its own explicit name only."""
    from caterpillar_spark.operators import REGISTRY
    from caterpillar_spark.operators.sampling import nth, nth_keyed

    assert REGISTRY["sample_nth"] is nth_keyed
    assert REGISTRY["sample_nth_keyed"] is nth_keyed
    assert REGISTRY["sample_nth_positional"] is nth
