"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``      — brute-force exact top-k: broadcast the (small)
  query set against the corpus; dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, no Python). The correctness baseline.
- ``lsh_bucketed_topk`` — the scale path: sign-random-projection LSH
  buckets (deterministic hyperplanes derived from shared_hash64, so runs
  are reproducible); candidates only within matching buckets, then exact
  re-rank. At 10^9 vectors the bucket join replaces the O(N·Q) scan.
- ``cosine_neardup_pairs`` — embedding-cosine near-duplicate detection,
  blocked by LSH bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from caterpillar_spark.functions import shared_hash64
from caterpillar_spark.operators import register


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    # cast to double element-wise for cross-engine float stability
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


@register("ann_cosine_topk")
def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (brute force). The query side is
    broadcast — the corpus is scanned once, never shuffled."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _srp_bucket(vec: Column, n_planes: int, dim: int, seed: int = 42) -> Column:
    """Sign-random-projection bucket id. Hyperplane component (p, d) is a
    deterministic pseudo-random value in [-1, 1) from shared_hash64 — no
    RNG, so bucket assignment is stable across runs and engines."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        comps = F.array(
            *[
                (
                    shared_hash64(F.lit(f"srp:{seed}:{p}:{d}")) % 2_000_001
                    - 1_000_000
                ).cast("double")
                / 1_000_000.0
                for d in range(dim)
            ]
        )
        proj = _dot(F.transform(vec, lambda x: x.cast("double")), comps)
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


@register("ann_lsh_topk")
def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an SRP bucket with the query,
    then exact cosine re-rank within candidates. Recall grows with fewer
    planes / multiple tables; the join is blocked on the bucket id."""
    b = lambda df, name: df.withColumn(name, _srp_bucket(F.col(vec_col), n_planes, dim))
    q = b(queries, "qb").select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "qb"
    )
    c = b(corpus, "cb").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "cb"
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("cb") == F.col("qb")) & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


@register("ann_ivf_topk")
def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: the corpus is partitioned into K centroid
    lists; a query probes only its ``n_probe`` nearest lists, then exact
    cosine re-ranks the candidates — the classic coarse-quantizer index
    (IVF-Flat), the other standard ANN scale path next to LSH.

    Plan shape at 10^9 vectors: ONE corpus scan joined against K broadcast
    centroids (assignment), a shuffle keyed by centroid id, and a
    candidate join blocked on centroid id — never an all-pairs product.
    Centroids here are a deterministic corpus sample (first K by id) so
    runs and the DuckDB oracle reproduce exactly; a k-means refinement
    drops in without changing any join (only the centroid table's values).
    Assignment order uses ROUNDED cosine + centroid-id tie-break — the
    discrete choice must match across engines, and raw-double ordering is
    one ulp away from divergence."""
    cent = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cent_vec")
    )

    def assign(df: DataFrame, idn: str, vecn: str, n_best: int) -> DataFrame:
        w = Window.partitionBy(idn).orderBy(F.desc("sim"), F.asc("cid"))
        return (
            df.crossJoin(F.broadcast(cent))
            .withColumn(
                "sim", F.round(cosine(F.col(vecn), F.col("cent_vec")), 6)
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n_best)
            .select(idn, vecn, "cid")
        )

    c_assigned = assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
        ),
        "neighbor_id",
        "cvec",
        1,
    )
    q_probes = assign(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ),
        "query_id",
        "qvec",
        n_probe,
    )
    scored = (
        c_assigned.join(q_probes, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


@register("dedup_embedding_cosine")
def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-blocked (pairs must share a
    bucket — at high cosine they almost surely do)."""
    withb = df.withColumn("b", _srp_bucket(F.col(vec_col), n_planes, dim)).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "b"
    )
    pairs = (
        withb.alias("l")
        .join(
            withb.alias("r"),
            (F.col("l.b") == F.col("r.b")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return pairs
