"""Training-data pipeline operators over document corpora: dedup families
(exact, MinHash-LSH, SimHash, n-gram Jaccard), text analysis (language ID,
quality scoring, token counting, fingerprinting).

Not in the reference (it has no corpus ops) — these are the engine's
added-value surface for 100 TB text pipelines. Every op is pure Column
expressions so signatures are reproducible by the DuckDB oracle: the shared
primitive is ``shared_hash64`` (md5-based 60-bit hash both engines compute
identically).

Scale notes baked into each op:
- dedup joins are blocked (by band hash / language / exact hash), never an
  unblocked O(n²) cross join;
- token explosion happens AFTER distinct-shingling per doc, bounding the
  shuffle to O(total distinct shingles);
- all aggregates are hash aggs with map-side partial combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from caterpillar_spark.functions import shared_hash64
from caterpillar_spark.operators import fan_out, register

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def _words(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


# --------------------------------------------------------------- exact dedup
@register("dedup_exact")
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one representative (min id) per md5,
    with the duplicate count. Hash-groupBy — one shuffle on the digest."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count("*").alias("n_dupes"),
        )
    )


# ------------------------------------------------------------------- minhash
def _shingle_array(text: Column, w: int) -> Column:
    """Distinct w-word shingles of ``text`` as one array column.

    Built by zipping the word array against its own 1..w-1 shifted slices
    (``zip_with`` pads the shorter side with null, and ``concat`` nulls
    out the incomplete tail windows, which the final ``slice`` drops) —
    NOT by ``transform(sequence(1, n-w+1), i -> array_join(slice(words,
    i, w)))``: Catalyst inlines the ``split`` subtree into that lambda
    and re-evaluates the full regex split once PER SHINGLE, which made
    shingling quadratic in document length (measured 39s for a 50k-doc
    corpus vs 12.6s for this construction — OPTIMIZATION_r07.md).
    Documents shorter than ``w`` words keep the old semantics: one
    shingle joining whatever words exist."""
    words = _words(text)
    n = F.size(words)
    if w <= 1:
        sh = words
    else:
        acc = words
        for j in range(1, w):
            shifted = F.slice(words, j + 1, F.greatest(n - j, F.lit(0)))
            acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
        sh = F.when(n >= w, F.slice(acc, 1, n - w + 1)).otherwise(
            F.array(F.array_join(F.slice(words, 1, w), " "))
        )
    return F.array_distinct(sh)


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_w: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature over w-word shingles.

    shingle -> k hash family members H_i(s) = shared_hash64(i || ':' || s);
    signature[i] = min over shingles, computed PER ROW with
    ``array_min(transform(...))`` — a pure map, no explode, no shuffle
    (the r7 rewrite of the explode + 8-way min-agg form, which paid a
    full shuffle of every distinct shingle for an aggregation the row
    already had locally). A null text yields the shingle array
    ``[null]`` and therefore an all-null signature row — the same rows
    the old explode-of-[null] path produced. No filter here: a filter on
    the shingle column gets predicate-pushed below the fan-out exchange
    and re-evaluates the whole shingle expression inside the single scan
    task."""
    shingles = _shingle_array(F.col(text_col), shingle_w)
    # fan out BEFORE shingling: the exchange then carries raw text (a few
    # hundred bytes/row), not shingle arrays, and the expensive md5 family
    # runs on every core even when the input is one unsplittable file
    narrow = fan_out(df.select(F.col(id_col), F.col(text_col)), id_col)
    base = narrow.select(F.col(id_col), shingles.alias("_sh"))
    return base.select(
        F.col(id_col),
        *[
            F.array_min(
                F.transform(
                    "_sh",
                    lambda s: shared_hash64(F.concat(F.lit(f"{i}:"), s)),
                )
            ).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )


@register("dedup_minhash_lsh")
def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_w: int = 3,
    max_bucket: int | str | None = "auto",
    with_drop_stats: bool = False,
) -> DataFrame:
    """MinHash + LSH banding: near-dup candidate pairs (a < b) that share at
    least one band. shingle→minhash→band→bucket-join; the join key is
    (band_idx, band hash) so it is fully blocked — no cross join.

    ``max_bucket`` guards the within-bucket quadratic against degenerate
    band keys (empty/boilerplate text at web scale): buckets holding more
    rows than the cap are dropped before pairing, bounding candidates at
    ``n·cap/2`` (see :mod:`caterpillar_spark.operators.lsh`). ``"auto"``
    derives the cap from the corpus size; ``None`` disables the guard.
    ``with_drop_stats`` appends a ``dropped_buckets`` lineage column so a
    pipeline can observe how much the guard fired.

    Pairing shape (r7): one shuffle keyed on (band_idx, band_key) into a
    ``collect_list`` of sorted ids per bucket, then in-array combination
    explode — NOT a bucket-keyed self-join. The self-join planned the
    whole signature subtree once per join side (and the guard's anti-join
    doubled it again: 4 full corpus passes in the physical plan); the
    grouped form computes signatures once per guard side. Per-bucket list
    size is bounded by ``cap`` BEFORE the collect (the guard anti-join
    runs first), so the collected arrays stay metadata-sized even on
    degenerate corpora."""
    from caterpillar_spark.operators.lsh import drop_hot_buckets, resolve_cap

    sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_w)
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"h{b * band_size + j}").cast("string")
                        for j in range(band_size)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sig.select(F.col(id_col), F.explode(bands).alias("band")).select(
        F.col(id_col).alias("id"), "band.band_idx", "band.band_key"
    )
    cap = resolve_cap(max_bucket, df.count)
    oversized = None
    if cap is not None:
        # the guard gives `banded` two consumers (bucket-size agg + kept
        # pairing); persist materializes the signature subtree once per
        # query instead of recomputing the scan→shingle→md5 pipeline for
        # each (measured 3.8->2.8s at sf1.0, and the gap widens under
        # load). ~40B/row derived data, MEMORY_AND_DISK, freed by the
        # context cleaner when the query's plan is dropped.
        banded = banded.persist()
        banded, oversized = drop_hot_buckets(banded, ["band_idx", "band_key"], cap)
    ids = F.array_sort(F.collect_list("id"))
    # all (i < j) combinations of the sorted id list, as one array column:
    # id ordering inside the bucket gives id_a < id_b for free
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda a, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids")) - i - 1),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )
    pairs = (
        banded.groupBy("band_idx", "band_key")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(combos).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )
    if with_drop_stats:
        n_dropped = (
            oversized.agg(F.count(F.lit(1)).alias("dropped_buckets"))
            if oversized is not None
            else None
        )
        pairs = (
            pairs.withColumn("dropped_buckets", F.lit(0).cast("long"))
            if n_dropped is None
            else pairs.crossJoin(F.broadcast(n_dropped))
        )
    return pairs


# ------------------------------------------------------------------- simhash
@register("dedup_simhash")
def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """Per-doc SimHash over word tokens (bit b set iff the sum of ±1 votes
    from token hashes is positive). Computed PER ROW (r7): token hashes
    once into an array, then one ``aggregate`` per bit — a pure map with
    no explode, no shuffle, and each token md5-hashed exactly once
    (the explode + 16-vote hash agg it replaces shuffled every token).
    Vote sums are identical, so the output is bit-identical."""
    # null text: the old explode dropped the doc; keep that by filtering
    # on the raw column (a cheap IsNotNull that pushes into the scan)
    narrow = fan_out(
        df.select(F.col(id_col), F.col(text_col)).filter(
            F.col(text_col).isNotNull()
        ),
        id_col,
    )
    hashed = narrow.select(
        F.col(id_col),
        F.transform(_words(F.col(text_col)), lambda t: shared_hash64(t)).alias(
            "_th"
        ),
    )
    def vote(b: int) -> Column:
        return F.aggregate(
            F.col("_th"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
    sim = None
    for b in range(bits):
        term = F.when(vote(b) > 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return hashed.select(F.col(id_col), sim.cast("long").alias("simhash"))


# ------------------------------------------------------------ ngram jaccard
@register("dedup_ngram_jaccard")
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "lang",
    threshold: float = 0.8,
    n: int = 2,
    prefix_filter: bool = True,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard within a blocking key,
    candidate-bounded by EXACT prefix filtering (the All-Pairs / parallel
    set-similarity-join construction: Bayardo et al. WWW'07, Vernica et
    al. SIGMOD'10 — public algorithms).

    Why not a plain inverted-index self-join: inside one dominant block
    (``lang='en'`` at 100 TB) frequent grams make that join near-quadratic.
    Prefix filtering keeps it exact while joining only on each document's
    ``|g| - ceil(t*|g|) + 1`` RAREST grams (global rarity order): if
    J(A,B) >= t then |A∩B| >= t*max(|A|,|B|), so fewer than that many
    grams of either doc can precede the first common gram in the global
    order — the first common gram lies in BOTH prefixes, and the prefix
    join finds every qualifying pair. A size-ratio predicate
    (t*max <= min) prunes further, also implied by J >= t.

    Stages (all blocked/bounded):
      1. distinct n-grams per doc (explode AFTER array_distinct);
      2. gram document-frequencies (hash agg) -> per-doc rarity ranks;
      3. candidate pairs: prefix self-join on (block, gram) + size-ratio;
      4. exact intersection counts: candidates joined back to the FULL
         gram sets (join keys carry the doc id -> fully blocked);
      5. |A∪B| = |A|+|B|−|A∩B| -> Jaccard -> threshold.

    Output is IDENTICAL to the unfiltered join (prefix filtering is
    lossless for J >= t), which is what the DuckDB oracle checks.
    """
    # same zip_with construction as MinHash shingling (_shingle_array):
    # the old transform(sequence(...), i -> slice(split(...))) form re-ran
    # the regex split once per gram (quadratic in document length)
    grams = _shingle_array(F.col(text_col), n)
    toks = fan_out(
        df.select(F.col(id_col), F.col(block_col), F.col(text_col)), id_col
    ).select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.explode(grams).alias("g"),
    )
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))

    if prefix_filter:
        from pyspark.sql import Window

        freq = toks.groupBy("blk", "g").agg(F.count("*").alias("df"))
        w = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("g"))
        prefix = (
            toks.join(freq, ["blk", "g"])
            .join(sizes, "id")
            .withColumn("rn", F.row_number().over(w))
            # the 1e-9 slack biases float boundary cases toward a LONGER
            # prefix / LOOSER ratio — extra candidates are re-verified
            # exactly in stage 4, missing ones would be lost
            .filter(
                F.col("rn")
                <= F.col("sz")
                - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9))
                + 1
            )
            .select("id", "blk", "g", "sz")
        )
        cand = (
            prefix.alias("l")
            .join(
                prefix.alias("r"),
                (F.col("l.blk") == F.col("r.blk"))
                & (F.col("l.g") == F.col("r.g"))
                & (F.col("l.id") < F.col("r.id"))
                & (F.col("l.sz") * threshold - 1e-9 <= F.col("r.sz"))
                & (F.col("r.sz") * threshold - 1e-9 <= F.col("l.sz")),
            )
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct()
        )
        ga = toks.select(F.col("id").alias("id_a"), "g")
        gb = toks.select(F.col("id").alias("id_b"), "g")
        inter = (
            cand.join(ga, "id_a")
            .join(gb, ["id_b", "g"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        inter = (
            toks.alias("l")
            .join(
                toks.alias("r"),
                (F.col("l.blk") == F.col("r.blk"))
                & (F.col("l.g") == F.col("r.g"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .agg(F.count("*").alias("inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ----------------------------------------------------------- dup clustering
@register("dedup_clusters")
def dedup_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
    a_col: str = "id_a",
    b_col: str = "id_b",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs -> duplicate clusters (connected
    components) -> ``(id, cluster_id)`` with cluster_id = min member id.

    Distributed min-label propagation: each node repeatedly adopts the
    smallest label among itself and its neighbors; converges in
    O(log(diameter)) rounds (dedup clusters are tiny, so 2-3 rounds in
    practice). Each round is one join + one hash agg; iteration stops
    early on a driver-checked convergence count. The follow-up "keep one
    representative per cluster" is ``filter(id == cluster_id)``.

    Every ``checkpoint_every`` rounds the label frame is
    ``localCheckpoint``-ed: iterative self-joins otherwise stack the
    logical plan each round and Catalyst planning blows up long before
    the data does (on a long-running production cluster prefer reliable
    ``checkpoint()`` to survive executor loss; local truncation is the
    right default for a bounded job).
    """
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionByName(
            pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b"))
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    edges = edges.persist()
    labels = labels.persist()
    for it in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.id)
            .groupBy("a")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        new_labels = labels.join(
            neighbor_min, labels.id == neighbor_min.a, "left"
        ).select(
            "id",
            F.least(
                F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        if (it + 1) % checkpoint_every == 0:
            # truncate the stacked self-join lineage (plan depth is the
            # iterative-algorithm scale killer, not row counts)
            new_labels = new_labels.localCheckpoint()
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


# ------------------------------------------------------------- text analysis
@register("lang_id")
def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: stopword-ratio rule (deterministic CASE so the
    oracle reproduces it; a real model slots in as a pandas UDF)."""
    words = _words(F.col(text_col))
    stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS))
    )
    ratio = stop / F.greatest(F.size(words), F.lit(1))
    return df.select(
        F.col(id_col),
        F.round(ratio, 4).alias("stopword_ratio"),
        F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


@register("quality_score")
def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality scoring: length/word/stopword/punct features + a composite
    score. All arithmetic, fully oracle-reproducible."""
    txt = F.col(text_col)
    words = _words(txt)
    n_words = F.size(words)
    n_chars = F.length(txt)
    avg_wlen = n_chars / F.greatest(n_words, F.lit(1))
    stop_ratio = F.size(F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS))) / F.greatest(
        n_words, F.lit(1)
    )
    punct = F.length(txt) - F.length(F.regexp_replace(txt, r"[^\w\s]", ""))
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 10, F.lit(1.0)) * 0.3
        + F.when((avg_wlen >= 3) & (avg_wlen <= 8), 0.3).otherwise(0.0)
    )
    # floor-scaled integer, not round(): Spark's round() rounds the decimal
    # string repr of the double while DuckDB rounds the binary value — they
    # disagree on exact .xxxx5 boundaries; floor on the same double doesn't.
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(avg_wlen, 4).alias("avg_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        punct.alias("n_punct"),
        F.floor(score * 10000 + 0.5).cast("long").alias("quality_x1e4"),
    )


@register("token_count")
def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish regex tokens
    (letter-runs / digit-runs / single punct)."""
    txt = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_words(txt)).alias("ws_tokens"),
        F.regexp_count(txt, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).alias(
            "re_tokens"
        ),
    )


@register("fingerprint")
def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: polynomial rolling hash over the word sequence
    (order-sensitive, unlike the dedup set hashes). Arithmetic kept within
    int64 under ANSI mode: acc = (acc*31 + h(word) mod 1e6+3) mod 1e9+7."""
    words = _words(F.col(text_col))
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + shared_hash64(w) % 1000003) % 1000000007,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
