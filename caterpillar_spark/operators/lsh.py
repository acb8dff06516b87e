"""Hot-bucket guards for LSH candidate generation.

The within-bucket self-join behind every LSH pairing op is quadratic in
bucket size. On a real web corpus one degenerate key — empty text, a
boilerplate header, the zero vector — routes a huge row count into ONE
bucket and that single bucket dominates the whole job (the classic
training-corpus failure; at 100 TB it is not an edge case, it is the
expected case). The standard production mitigation is to drop buckets
above a size cap before pairing: a bucket that large is (by the LSH
construction itself) almost never a genuine near-dup cluster, and even if
it were, its O(cap²) pair explosion is useless downstream.

With a cap the total candidate count is bounded by ``n_rows * cap / 2``
regardless of key skew — the property that lets the pair join survive a
100× scale-up. The guard costs one extra hash-agg on the SAME key the
pair join shuffles on; the oversized set it broadcasts is at most
``n_rows / cap`` rows (each oversized bucket holds > cap rows), so the
anti-join side stays metadata-sized by construction.
"""

from __future__ import annotations

from math import isqrt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_cap_for(n_rows: int, floor: int = 1024, factor: int = 4) -> int:
    """Scale-aware bucket-size cap: ``max(floor, factor * sqrt(n))``.

    Grows slowly enough that worst-case candidates ``n * cap / 2`` stay
    far from quadratic, but sits orders of magnitude above the expected
    bucket occupancy of a healthy LSH table — so it fires only on
    degenerate keys, never on honest near-dup clusters at test scale
    (same derived-not-fixed philosophy as :func:`planes_for`)."""
    return max(floor, factor * isqrt(max(0, int(n_rows))))


def drop_hot_buckets(
    banded: DataFrame, keys: list[str], cap: int
) -> tuple[DataFrame, DataFrame]:
    """Remove rows belonging to buckets with more than ``cap`` rows.

    Returns ``(kept, oversized)`` where ``oversized`` is the (small —
    ≤ n/cap rows) DataFrame of dropped bucket keys with their sizes,
    broadcast into a left-anti join so ``banded`` itself is scanned
    once and shuffled only by the aggregate (same key as the downstream
    pair join, so AQE can reuse the exchange)."""
    sizes = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("bucket_rows"))
    oversized = sizes.filter(F.col("bucket_rows") > cap)
    kept = banded.join(
        F.broadcast(oversized.select(*keys)), list(keys), "left_anti"
    )
    return kept, oversized


def resolve_cap(max_bucket, n_rows_fn) -> int | None:
    """Resolve a ``max_bucket`` parameter: ``"auto"`` derives the cap from
    the corpus size (one count job), ``None`` disables the guard, an int
    is used as-is. ``n_rows_fn`` is lazy so the count job only runs when
    actually deriving."""
    if max_bucket is None:
        return None
    if max_bucket == "auto":
        return bucket_cap_for(n_rows_fn())
    return int(max_bucket)
