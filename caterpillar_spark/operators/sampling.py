"""Sampling operators — the reference's ``sample`` task family
(``task/sample/sample.go:22-86``). Distributed data has no positional
order, so each variant takes an explicit order column where the reference
used arrival order (arrival order IS a column in our model: the LSN)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from caterpillar_spark.operators import register


@register("sample_head")
def head(df: DataFrame, order: str, n: int) -> DataFrame:
    """``head`` filter (task/sample/head.go:22-31): first n by order col."""
    return df.orderBy(F.col(order).asc()).limit(n)


@register("sample_tail")
def tail(df: DataFrame, order: str, n: int) -> DataFrame:
    """``tail`` filter (task/sample/tail.go:25-49): last n, original order
    preserved — ring buffer in the reference; top-k + re-sort here."""
    last = df.orderBy(F.col(order).desc()).limit(n)
    return last.orderBy(F.col(order).asc())


@register("sample_nth_positional")
def nth(df: DataFrame, order: str, divider: int) -> DataFrame:
    """``nth`` filter (task/sample/nth.go:22-32): every divider-th record by
    position (0-based index % divider == 0).

    DEPRECATED at scale: positional indexing of unordered distributed data
    requires a GLOBAL row_number window — a single-task sort that cannot
    scale past one executor's memory. Kept for small-data parity with the
    reference; use :func:`nth_keyed` (the order column is dense, e.g. the
    LSN) which is a pure pushed-down filter."""
    import warnings

    warnings.warn(
        "sampling.nth uses a global single-task sort window; "
        "use nth_keyed(order, divider) at scale",
        DeprecationWarning,
        stacklevel=2,
    )
    w = Window.orderBy(F.col(order).asc())
    return (
        df.withColumn("_idx", F.row_number().over(w) - 1)
        .filter(F.col("_idx") % divider == 0)
        .drop("_idx")
    )


@register("sample_percent")
def percent(df: DataFrame, pct: float, seed: int = 42) -> DataFrame:
    """``percent`` filter (task/sample/percent.go:35-49): independent
    Bernoulli keep. Seeded here (the reference uses crypto RNG — we need
    reproducibility for certification)."""
    return df.sample(fraction=pct / 100.0, seed=seed)


@register("sample_random")
def random_n(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """``random`` filter (task/sample/random.go:28-54). The reference picks
    WITH replacement from a buffer; distributed form is without replacement
    (documented divergence, SURVEY.md §2.7)."""
    return df.orderBy(F.rand(seed)).limit(n)


@register("sample_nth")
@register("sample_nth_keyed")
def nth_keyed(df: DataFrame, order: str, divider: int) -> DataFrame:
    """Scale-friendly nth: uses the (dense, unique) order column value
    directly instead of a global row_number window — no single-task sort.
    Equivalent to `nth` when `order` is dense from 0 (e.g. the LSN).

    This is the PRIMARY ``sample_nth`` registry entry (r6): a pipeline
    config asking for nth sampling gets the pushdown-friendly filter; the
    positional window form stays available as ``sample_nth_positional``
    for small-data parity runs."""
    return df.filter(F.col(order) % divider == 0)


def _hash_hex8(key, salt: str = ""):
    """First 8 hex digits of md5(salt || key-as-string) — a uniform
    [0, 16^8) draw that Spark and any ANSI engine compute identically
    (md5 of the UTF-8 string, lowercase hex, lexicographic compare)."""
    s = F.col(key).cast("string")
    if salt:
        s = F.concat(F.lit(salt), s)
    return F.substring(F.md5(s), 1, 8)


@register("sample_percent_hash")
def percent_hash(df: DataFrame, key: str, pct: float, salt: str = "") -> DataFrame:
    """Deterministic percent sample: keep rows whose md5(key) falls under
    the pct threshold. Unlike the seeded Bernoulli :func:`percent`, the
    kept SET is a pure function of the key — stable across retries,
    engines, partitionings, and cluster sizes, which is what a certified
    CDC path needs (task/sample/percent.go:35-49 uses crypto RNG; this is
    the reproducible re-expression). ``salt`` rotates the sample without
    touching the keys. Pure pushed-down filter — no shuffle, no state."""
    if not 0.0 <= pct <= 100.0:
        raise ValueError(f"pct must be in [0, 100], got {pct}")
    if pct == 100.0:
        return df  # cutoff 16^8 is 9 hex digits — lexicographic compare
        # against 8-digit hashes would invert; keep-all needs no filter
    cutoff = format(int(pct / 100.0 * 16**8), "08x")
    return df.filter(_hash_hex8(key, salt) < F.lit(cutoff))


@register("sample_random_hash")
def random_n_hash(df: DataFrame, key: str, n: int, salt: str = "") -> DataFrame:
    """Deterministic n-row sample: the n smallest md5(salt || key) values.
    Same reproducibility argument as :func:`percent_hash`; Spark executes
    orderBy+limit as a per-partition top-n merged on the driver
    (TakeOrderedAndProject), so it never global-sorts the input.

    Orders by the FULL 128-bit digest, not the 8-hex prefix percent_hash
    thresholds on: a 32-bit rank has ~N/2^32 odds of a tie at the n-th
    boundary (~20% at 10^9 rows), and a tie there is broken by partition
    encounter order — nondeterministic and engine-divergent.

    PRECONDITION: ``key`` values must be UNIQUE (ADVICE r5). Duplicate
    keys hash to identical digests, and the n-th-boundary tie between
    them is again broken by partition encounter order. With a non-unique
    key, pass a composite (e.g. ``F.concat(key, lsn)`` materialized as a
    column) or accept a nondeterministic boundary row."""
    s = F.col(key).cast("string")
    if salt:
        s = F.concat(F.lit(salt), s)
    return df.orderBy(F.md5(s).asc()).limit(n)
