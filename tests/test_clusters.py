from __future__ import annotations

from caterpillar_spark.operators.docs import dedup_clusters


def test_connected_components(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
        ["id_a", "id_b"],
    )
    got = {
        r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_representatives_end_to_end(spark):
    """minhash pairs -> clusters -> one representative per cluster."""
    from caterpillar_spark.operators.docs import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("lazy", "sleepy", 1)),
            (3, base.replace("quick", "swift", 1)),
            (4, "completely different text entirely unrelated words here " * 5),
        ],
        ["doc_id", "text"],
    )
    pairs = minhash_lsh_pairs(docs)
    labels = dedup_clusters(pairs)
    clusters = {r["id"]: r["cluster_id"] for r in labels.collect()}
    assert clusters.get(1) == clusters.get(2) == clusters.get(3) == 1
    assert 4 not in clusters  # no near-dup edges -> not in any cluster
    reps = [r["id"] for r in labels.filter("id = cluster_id").collect()]
    assert reps == [1]
