"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-bounded and oracle-reproducible:

* **exact**        — md5(text) hash → one shuffle, keep min-id per hash.
* **MinHash+LSH**  — char-shingles → k md5-seeded min-hashes → b bands;
                     only rows sharing a band bucket are pair-joined, so
                     the candidate join is |bucket|²-bounded, never n².
* **SimHash**      — 60-bit weighted-majority token hash; near-dups block
                     on 15-bit bands (Hamming-distance style).
* **n-gram Jaccard** — inverted-index blocking on token n-grams, exact
                     Jaccard verify on candidates.
* **embedding cosine** — random-hyperplane LSH buckets, exact cosine
                     verify (see also :mod:`simsearch`).

Scale design (100 TB): every strategy is one linear pipeline —
(signature scan) → (slim ``(id, band, bucket)`` band shuffle — no
payload) → (window count per bucket, hot buckets above ``bucket_cap``
dropped *before* any per-bucket materialization) → (bounded
``collect_list`` + pair explode, ≤ cap² pairs per bucket) → (payloads
joined back by id once for verification).  Nothing persists, nothing
self-joins, nothing collects to the driver; a degenerate bucket (empty
docs, boilerplate) costs one window count, not |bucket|².  Canonical
selection is min-id within a duplicate group (single-link, one hop —
iterate for transitive closure if needed).
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import ensure_parallelism, md5_int32, md5_int60, shingles, ws_tokens

logger = logging.getLogger(__name__)

__all__ = [
    "exact_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "minhash_dedup_transitive",
    "exact_decontaminate",
    "minhash_decontaminate",
    "ngram_decontaminate",
    "bloom_decontaminate",
    "novelty_scores",
    "dedup_components",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_dup_pairs",
    "embedding_dedup",
    "line_dedup",
    "duplicate_passage_flags",
    "remove_duplicate_passages",
    "dedup_keep_best",
    "bucket_skew_stats",
    "containment_join",
]


# ------------------------------------------------- capped bucket pairing


def _bucket_pairs(
    slim: DataFrame, cap: int, payload_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Candidate id-pairs from slim ``(__id, __band, __bucket[, payload])``
    rows: window-count per bucket, drop buckets larger than ``cap`` (and
    singletons), collect the survivors per bucket (array bounded by cap),
    explode ordered pairs, dedupe across bands.

    One shuffle for the window+groupBy (same partitioning, exchange
    reused) and one for the pair dedupe.  ``payload_cols`` rides along
    only for cheap scalar payloads (e.g. a 60-bit SimHash); array
    payloads must be joined back by id by the caller instead.
    """
    w = Window.partitionBy("__band", "__bucket")
    capped = slim.withColumn("__cnt", F.count(F.lit(1)).over(w)).filter(
        (F.col("__cnt") >= 2) & (F.col("__cnt") <= cap)
    )
    entry = F.struct(F.col("__id"), *[F.col(c) for c in payload_cols])
    buckets = capped.groupBy("__band", "__bucket").agg(
        F.sort_array(F.collect_list(entry)).alias("__es")
    )
    return (
        buckets.select(F.explode("__es").alias("__a"), "__es")
        .select("__a", F.explode("__es").alias("__b"))
        .filter(F.col("__a.__id") < F.col("__b.__id"))
        .select(
            F.col("__a.__id").alias("id_a"),
            F.col("__b.__id").alias("id_b"),
            *[F.col(f"__a.{c}").alias(f"{c}_a") for c in payload_cols],
            *[F.col(f"__b.{c}").alias(f"{c}_b") for c in payload_cols],
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def _join_payload(pairs: DataFrame, payload: DataFrame, suffix: str) -> DataFrame:
    """Join one side's payload back by id (payload has ``__id`` + value
    columns; value columns get ``suffix`` appended).

    The join is pinned to SORT-MERGE (``merge`` hint): both sides are
    corpus-scaled in the general case — pairs grow quadratically with
    duplication multiplicity, and the payload side's computed arrays
    (shingle sets, embeddings) are many times larger than the parquet
    scan Catalyst estimates from.  The r9 100× rehearsal showed the
    static planner locking BroadcastHashJoin on BOTH sides from those
    under-estimates and the driver dying in the broadcast build
    ("Not enough memory to build and broadcast") — and AQE cannot
    demote a statically-planned broadcast, only promote a shuffled
    join.  Sort-merge shuffles and spills gracefully at any scale; the
    small-corpus cost is one sort of a tiny frame."""
    side = payload.select(
        F.col("__id").alias(f"id_{suffix}"),
        *[
            F.col(c).alias(f"{c}_{suffix}")
            for c in payload.columns
            if c != "__id"
        ],
    )
    return pairs.hint("merge").join(side.hint("merge"), f"id_{suffix}")


def bucket_skew_stats(slim: DataFrame, cap: int) -> dict:
    """Diagnostic job: bucket-size distribution and what the cap drops.
    Opt-in (runs one small aggregation); the operators themselves stay
    lazy and log only their configuration."""
    row = (
        slim.groupBy("__band", "__bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.count(F.lit(1)).alias("buckets"),
            F.max("n").alias("max_bucket"),
            F.count(F.when(F.col("n") > cap, 1)).alias("dropped_buckets"),
            F.coalesce(
                F.sum(F.when(F.col("n") > cap, F.col("n"))), F.lit(0)
            ).alias("dropped_rows"),
        )
        .first()
    )
    stats = row.asDict()
    if stats["dropped_buckets"]:
        logger.warning(
            "bucket cap %d drops %d hot bucket(s) covering %d rows "
            "(max bucket %d)",
            cap, stats["dropped_buckets"], stats["dropped_rows"],
            stats["max_bucket"],
        )
    return stats


# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the smallest-id row per identical text (hash-groupBy; the md5
    collision probability is negligible and the oracle uses the same
    hash).  One shuffle on the 32-hex digest."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------- minhash


_MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash family (aᵢ, bᵢ): derived from md5 so
    the SQL oracle can inline the same constants."""
    import hashlib

    out = []
    for i in range(k):
        a = int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:8], 16)
        b = int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:8], 16)
        out.append((a % (_MINHASH_P - 1) + 1, b % _MINHASH_P))
    return out


def minhash_signature(col: Column, k: int = 16, shingle: int = 5) -> Column:
    """Array of k min-hashes over character shingles.

    One md5 per shingle; the k family members are affine transforms
    (aᵢ·h + bᵢ) mod 2³¹−1 of that base hash (universal hashing) — k
    cheap integer ops instead of k md5 passes, exact in int64 in both
    engines (a·h < 2^63).

    The base-hash array is bound ONCE through a lambda variable
    (``transform`` over a single-element array): embedding it directly in
    each of the k slot expressions would re-evaluate the md5 pass k
    times — Catalyst does not CSE across sibling aggregate expressions.
    """
    return minhash_signature_from_shingles(shingles(col, shingle), k)


def minhash_signature_from_shingles(sh: Column, k: int = 16) -> Column:
    """Signature from a (pre-materialized) shingle array column."""
    base = F.transform(sh, lambda s: md5_int32(s))
    params = minhash_params(k)

    def all_slots(bh: Column) -> Column:
        return F.array(
            *[
                F.array_min(
                    F.transform(
                        bh, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MINHASH_P)
                    )
                )
                for a, b in params
            ]
        )

    return F.element_at(F.transform(F.array(base), all_slots), 1)


def _band_buckets_from_sig(sig: Column, k: int, bands: int) -> Column:
    """Per-band bucket keys — md5 over the comma-joined signature slice,
    one array element per band.  The ONE construction of the LSH bucket
    key (ADVICE r13: ``minhash_band_buckets`` and ``minhash_lsh_pairs``
    each inlined a copy that had to stay bit-identical for cross-
    function bucket guarantees to hold; same factoring pattern as
    ``_gram_hashes``)."""
    assert k % bands == 0, "k must divide into equal bands"
    rows = k // bands
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.element_at(sig, b * rows + r + 1) for r in range(rows)],
                )
            )
            for b in range(bands)
        ]
    )


def minhash_band_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    shingle: int = 5,
) -> DataFrame:
    """Slim LSH blocking rows ``(__id, __band, __bucket)`` — the md5 of
    each band's signature slice.  No payload: the banded shuffle carries
    ids only (VERDICT r1: payload-through-shuffle was the scale risk)."""
    # min over the distinct shingle set == min over the multiset; hashing
    # only distinct shingles also halves the md5 work on repetitive text
    sig = minhash_signature_from_shingles(
        F.array_distinct(shingles(F.col(text_col), shingle)), k
    )
    return df.select(
        F.col(id_col).alias("__id"), sig.alias("__sig")
    ).select(
        "__id",
        F.posexplode(
            _band_buckets_from_sig(F.col("__sig"), k, bands)
        ).alias("__band", "__bucket"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    shingle: int = 5,
    threshold: float = 0.5,
    bucket_cap: int = 512,
) -> DataFrame:
    """Verified near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    shingle→minhash→band→bucket: candidate pairs come from
    :func:`_bucket_pairs` over slim blocking rows (buckets above
    ``bucket_cap`` dropped — a degenerate bucket would cost |bucket|²);
    the distinct-shingle sets are joined back by id for exact-Jaccard
    verification, so the banded shuffle never carries shingle arrays.
    Use :func:`bucket_skew_stats` on :func:`minhash_band_buckets` output
    to measure what a cap drops on a given corpus.
    """
    df = ensure_parallelism(df)
    logger.info("minhash_lsh_pairs: k=%d bands=%d bucket_cap=%d", k, bands, bucket_cap)
    # Shingle ONCE (guide §1.2): the distinct-shingle arrays feed both
    # the signature/banding pass and the exact-Jaccard verification —
    # without the checkpoint the payload joins (one shuffle per pair
    # side) re-shingled the corpus from the raw text twice more.  The
    # checkpointed frame is (id, distinct shingles): memory-and-disk
    # cached, spills at scale, and the verification join reads it
    # instead of re-deriving.  Values are identical — same expressions,
    # one materialization.
    payload = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingles(F.col(text_col), shingle)).alias("__sh"),
    ).localCheckpoint(eager=False)
    sig = minhash_signature_from_shingles(F.col("__sh"), k)
    slim = payload.select("__id", sig.alias("__sig")).select(
        "__id",
        F.posexplode(
            _band_buckets_from_sig(F.col("__sig"), k, bands)
        ).alias("__band", "__bucket"),
    )
    pairs = _bucket_pairs(slim, bucket_cap)
    cand = _join_payload(_join_payload(pairs, payload, "a"), payload, "b")
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size(F.array_union("__sh_a", "__sh_b"))
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame, text_col: str, id_col: str, **kwargs
) -> DataFrame:
    """Drop rows that near-duplicate a smaller-id row (one-hop
    single-link: b is dropped if any pair (a,b) with a<b verifies)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------- simhash

_SIMHASH_BITS = 60


def token_hashes(col: Column) -> Column:
    """60-bit md5 hash per whitespace token — materialize this with a
    ``withColumn`` before feeding :func:`simhash_from_hashes` so the md5
    pass runs once, not once per bit position."""
    return F.transform(ws_tokens(col), lambda t: md5_int60(t))


def simhash_from_hashes(hashes: Column) -> Column:
    """Pack the per-bit majority vote of pre-hashed tokens into a BIGINT.

    Single-pass formulation: one ``aggregate`` folds the token-hash array
    into a 60-element bit-count vector (``zip_with`` adds each hash's bit
    decomposition element-wise), then one fold packs the majority bits.
    The naive form — 60 independent ``aggregate`` calls, one per bit
    position, summed — builds an expression tree Catalyst spends seconds
    analyzing and traverses the hash array 60× per row; this one is ~60×
    smaller and touches each token hash once."""
    n = F.size(hashes)
    weights = F.array(
        *[F.lit(1 << b).cast("long") for b in range(_SIMHASH_BITS)]
    )
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), _SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                weights,
                lambda w: F.when(h.bitwiseAND(w) != 0, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long")),
            ),
            lambda a, x: a + x,
        ),
    )
    weighted = F.zip_with(
        counts,
        weights,
        lambda c, w: F.when(c * 2 > n, w).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        weighted, F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def simhash(col: Column) -> Column:
    """60-bit SimHash over whitespace tokens: per-bit majority vote of
    md5-hashed tokens, packed into a BIGINT.  Convenience form — prefer
    materializing :func:`token_hashes` first on big data."""
    return simhash_from_hashes(token_hashes(col))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 4,
    max_hamming: int = 8,
    bucket_cap: int = 512,
) -> DataFrame:
    """Candidate near-dup pairs: equal 15-bit SimHash band (pigeonhole for
    Hamming distance < bands), verified by exact popcount distance.

    The 60-bit hash is a scalar, so it rides through the slim blocking
    rows (8 bytes/row) instead of being re-derived or joined back —
    verification needs no payload join at all.  Buckets above
    ``bucket_cap`` are dropped before pair generation."""
    width = _SIMHASH_BITS // bands
    df = ensure_parallelism(df)
    logger.info("simhash_pairs: bands=%d bucket_cap=%d", bands, bucket_cap)
    base = df.select(
        F.col(id_col).alias("__id"), token_hashes(F.col(text_col)).alias("__hs")
    ).select("__id", simhash_from_hashes(F.col("__hs")).alias("__sh"))
    slim = base.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sh"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .cast("string")
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__bucket"),
    )
    cand = _bucket_pairs(slim, bucket_cap, payload_cols=("__sh",))
    ham = F.bit_count(F.col("__sh_a").bitwiseXOR(F.col("__sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------- n-gram Jaccard


def _token_ngrams(text: Column, n: int) -> Column:
    # token array lambda-bound once: the per-gram slice() lambda would
    # otherwise re-evaluate the captured split() for every gram (the
    # no-CSE trap — see PLANS_r5.md §8); short docs (< n tokens) fall
    # back to one whole-document gram
    def grams(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))

    return F.element_at(F.transform(F.array(ws_tokens(text)), grams), 1)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.3,
    df_cap: int = 256,
) -> DataFrame:
    """Exact token-n-gram Jaccard over candidates sharing ≥1 n-gram
    (inverted-index blocking).

    N-gram frequency is heavy-tailed (boilerplate headers, stop-phrase
    runs): a gram shared by f documents would generate f² candidate
    rows, so grams with document frequency above ``df_cap`` are dropped
    from the *blocking index* (pairs that share only ultra-common grams
    are below any useful Jaccard threshold anyway; the Jaccard itself is
    still computed on the full gram sets).  The inverted index carries
    ids only; gram sets are joined back by id for verification."""
    df = ensure_parallelism(df)
    logger.info("ngram_jaccard_pairs: n=%d df_cap=%d", n, df_cap)
    grams = _token_ngrams(F.col(text_col), n)
    # gram sets computed ONCE (the minhash_lsh_pairs discipline): the
    # checkpointed (id, gram set) frame feeds the blocking explode and
    # both verification joins — previously each consumer re-tokenized
    # and re-gram'd the corpus from raw text
    payload = df.select(
        F.col(id_col).alias("__id"), F.array_distinct(grams).alias("__g")
    ).localCheckpoint(eager=False)
    slim = payload.select(
        "__id", F.explode("__g").alias("__bucket")
    ).withColumn("__band", F.lit(0))
    pairs = _bucket_pairs(slim, df_cap)
    cand = _join_payload(_join_payload(pairs, payload, "a"), payload, "b")
    jac = F.round(
        F.size(F.array_intersect("__g_a", "__g_b"))
        / F.size(F.array_union("__g_a", "__g_b")),
        6,
    )
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------- embedding cosine


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    bucket_cap: int = 512,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Random-hyperplane LSH: ``n_planes`` signed projections → ``bands``
    buckets; pairs sharing a bucket get exact cosine verification.
    Hyperplanes are seeded and inlined as literals (broadcast-free).
    The banded shuffle carries ids only (vectors are dim×8 bytes — the
    heaviest payload of the family); buckets above ``bucket_cap``
    (e.g. the all-zero-vector bucket) are dropped before pairing, and
    vectors are joined back by id for the exact verify."""
    assert n_planes % bands == 0
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    logger.info(
        "embedding_dup_pairs: n_planes=%d bands=%d bucket_cap=%d",
        n_planes, bands, bucket_cap,
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = [
        (_dot(v, F.array(*[F.lit(float(x)) for x in planes[p]])) > 0).cast("int")
        for p in range(n_planes)
    ]
    width = n_planes // bands
    slim = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "", *[bits[b * width + r].cast("string") for r in range(width)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__bucket"),
    )
    pairs = _bucket_pairs(slim, bucket_cap)
    return _cosine_verify_pairs(pairs, df, vec_col, id_col, threshold)


def _cosine_verify_pairs(
    pairs: DataFrame,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-cosine verification of candidate id-pairs: join the vector
    payload back BY ID (the banded/clustered shuffle stays ids-only),
    compute the sequential-fold cosine, keep pairs ≥ threshold."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    payload = df.select(F.col(id_col).alias("__id"), v.alias("__v"))
    cand = _join_payload(_join_payload(pairs, payload, "a"), payload, "b")
    cos = _dot(F.col("__v_a"), F.col("__v_b")) / (
        F.sqrt(_dot(F.col("__v_a"), F.col("__v_a")))
        * F.sqrt(_dot(F.col("__v_b"), F.col("__v_b")))
    )
    return (
        cand.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ------------------------------------------------ transitive components


def dedup_components(
    pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components over verified duplicate pairs → (id, canonical)
    with canonical = min id of the component (transitive closure; the
    one-hop functions above under-merge when duplicates only touch via a
    shared neighbor).

    Iterative min-label propagation: each round every vertex takes the
    minimum label among itself and its neighbors; lineage is cut per
    round with localCheckpoint.  Rounds needed = graph diameter (small
    for dedup graphs); each round is one join + one groupBy.
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    changed = -1
    for it in range(max_iter):
        neighbor = (
            sym.join(labels.withColumnRenamed("id", "dst2"),
                     F.col("dst") == F.col("dst2"))
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor.withColumnRenamed("src", "id2"),
                        F.col("id") == F.col("id2"), "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
            )
        )
        updated = updated.localCheckpoint()
        # convergence check (a count() action) only every 2nd round:
        # labels decrease monotonically, so a zero one-round delta at a
        # check point proves global convergence; at worst one extra
        # (no-op) propagation round runs, for half the driver actions
        if it % 2 == 1 or it == max_iter - 1:
            changed = (
                updated.withColumnRenamed("label", "new_label")
                .join(labels.withColumnRenamed("id", "id2"),
                      F.col("id") == F.col("id2"))
                .filter(F.col("new_label") != F.col("label"))
                .count()
            )
        labels = updated
        if changed == 0:
            break
    else:
        # loop exhausted max_iter with changes still propagating — the
        # duplicate graph's diameter exceeds the iteration budget and the
        # components are under-merged; callers cannot tell from the output
        logger.warning(
            "dedup_components: not converged after %d iterations "
            "(%d labels still changing) — components may be under-merged; "
            "raise max_iter",
            max_iter, changed,
        )
    return labels.select("id", F.col("label").alias("canonical"))


def embedding_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    bucket_cap: int = 512,
    max_iter: int = 20,
    clusters: int | None = None,
    centroids=None,
    cluster_cap: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): rows whose embeddings form a near-duplicate
    cluster (pairwise cosine ≥ ``threshold``, closed transitively) keep
    only one representative — the minimum-id member — and every other
    cluster member is dropped.

    Composition of the family's scale-safe pieces: hyperplane-LSH
    candidate pairs with exact-cosine verify
    (:func:`embedding_dup_pairs` — ids-only banded shuffle, bucket cap),
    then min-label propagation (:func:`dedup_components`), then ONE
    broadcast-able anti-join of the dropped-id set against the corpus.
    No all-pairs path: pair count is bounded by ``bucket_cap²`` per
    bucket, and the component graph holds only verified-duplicate ids
    (tiny vs the corpus at real dup rates).

    ``clusters=`` / ``centroids=`` selects the PUBLISHED SemDeDup
    candidate generator instead of the LSH bands (VERDICT r8 #6): the
    corpus is k-means-partitioned (``centroids`` a prefit (k × dim)
    matrix, or ``clusters=k`` to fit one with
    :func:`..simsearch.kmeans_fit_distributed` — one scan per Lloyd
    iteration, only k·dim doubles on the driver) and near-duplicate
    pruning is CLUSTER-LOCAL — candidate pairs never cross a cluster
    boundary, the paper's recall/cost trade.  The cluster shuffle is
    ids-only, per-cluster pair count is capped by ``cluster_cap``
    (default ``bucket_cap``; an over-full cluster is dropped with the
    same degenerate-bucket semantics as the LSH path — refit with more
    clusters rather than letting one cluster go quadratic), and the
    exact-cosine verify joins vectors back by id.
    """
    if centroids is not None or clusters is not None:
        from .simsearch import assign_clusters, kmeans_fit_distributed

        if centroids is None:
            centroids = kmeans_fit_distributed(
                df, vec_col, nlist=clusters, seed=seed
            )
        slim = assign_clusters(df, vec_col, centroids).select(
            F.col(id_col).alias("__id"),
            F.lit(0).alias("__band"),
            F.col("__cluster").cast("string").alias("__bucket"),
        )
        cand = _bucket_pairs(slim, cluster_cap or bucket_cap)
        pairs = _cosine_verify_pairs(cand, df, vec_col, id_col, threshold)
    else:
        pairs = embedding_dup_pairs(
            df, vec_col, id_col, dim,
            threshold=threshold, n_planes=n_planes, bands=bands,
            seed=seed, bucket_cap=bucket_cap,
        )
    comp = dedup_components(pairs, max_iter=max_iter)
    dropped = comp.filter(F.col("id") != F.col("canonical")).select(
        F.col("id").alias(id_col)
    )
    # ids-only anti-join; AQE broadcasts the dropped set when it is
    # small (the common case) and falls back to a shuffled anti-join
    # when the dup rate makes it large — don't force either.
    return df.join(dropped, id_col, "left_anti")


def line_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_chars: int = 10,
) -> DataFrame:
    """C4-style cross-document line deduplication (Raffel et al. 2020,
    §2.2 "three-sentence span" rule at line granularity): every line of
    ``min_chars``+ characters that occurs verbatim anywhere else in the
    corpus keeps only its first occurrence — ordered by (doc id,
    position) — and is removed everywhere else; shorter lines pass
    through untouched.  Documents are reassembled with surviving lines
    in original order; a document whose every line is dropped vanishes.

    Shape: posexplode → ONE winner-election shuffle keyed on (line hash,
    line) → one doc-id shuffle to reassemble.  The window shuffle
    carries (line, id, pos); the md5-int60 leading key keeps partition
    routing narrow and comparisons short-circuited — at 100 TB you
    would route on the hash alone and verify equality on collision,
    which this keying is one `.drop` away from.
    """
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    h = md5_int60(F.col("__line"))
    w = Window.partitionBy(h, F.col("__line")).orderBy("__id", "__pos")
    kept = (
        lines.withColumn(
            "__rn",
            F.when(
                F.length("__line") >= min_chars, F.row_number().over(w)
            ).otherwise(F.lit(1)),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return kept.groupBy("__id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda x: x["__line"],
            ),
        ).alias(text_col)
    ).select(F.col("__id").alias(id_col), text_col)


def duplicate_passage_flags(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    min_run: int = 3,
) -> DataFrame:
    """Duplicated-passage detection (the span-dedup signal of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    at token-n-gram resolution instead of suffix arrays): a run of
    ``min_run`` consecutive n-grams each shared with at least one OTHER
    document marks a verbatim passage of ≥ ``n + min_run − 1`` tokens.
    Returns one row per input row: (id, max_dup_run, flagged) where
    ``max_dup_run`` is the longest such consecutive-shared-gram run.

    Shape: positional gram explode → distinct-(gram, doc) df count
    (ids+hash only — the corpus text never shuffles) → semi join back →
    one per-document window for run detection (gaps-and-islands:
    ``pos − row_number``).  Three slim shuffles, all keyed wide (gram
    hash / doc id); no all-pairs path and no driver materialization.
    """
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(_token_ngrams(F.col(text_col), n)).alias("__pos", "__g"),
    ).select("__id", "__pos", md5_int60(F.col("__g")).alias("__h"))
    shared = (
        grams.select("__h", "__id")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= 2)
        .select("__h")
    )
    dup = grams.join(shared, "__h", "left_semi")
    w = Window.partitionBy("__id").orderBy("__pos")
    runs = (
        dup.withColumn("__grp", F.col("__pos") - F.row_number().over(w))
        .groupBy("__id", "__grp")
        .agg(F.count(F.lit(1)).alias("__run"))
        .groupBy("__id")
        .agg(F.max("__run").alias("max_dup_run"))
    )
    return df.select(F.col(id_col)).join(
        runs.withColumnRenamed("__id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce(F.col("max_dup_run"), F.lit(0)).alias("max_dup_run"),
        (F.coalesce(F.col("max_dup_run"), F.lit(0)) >= min_run)
        .cast("int")
        .alias("flagged"),
    )


def remove_duplicate_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    min_run: int = 3,
) -> DataFrame:
    """Span-level dedup: REMOVE the duplicated passages that
    :func:`duplicate_passage_flags` detects, keeping the rest of each
    document (Lee et al. 2022 cut duplicated spans rather than whole
    documents — whole-doc dedup misses boilerplate shared across
    otherwise-distinct pages).

    A qualifying run of ``r >= min_run`` consecutive shared n-grams
    starting at token position ``s`` covers tokens ``[s, s+r+n-2]``;
    covered tokens are dropped (union over overlapping runs) and the
    document is rebuilt from the survivors in order.  Returns one row
    per input row: (id, clean_text, n_removed).

    Shape: the flags pipeline (three slim shuffles, ids+hashes only)
    plus one token-level anti join and a per-document rebuild
    aggregate; covered-position explode is bounded by document length.
    """
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(_token_ngrams(F.col(text_col), n)).alias("__pos", "__g"),
    ).select("__id", "__pos", md5_int60(F.col("__g")).alias("__h"))
    shared = (
        grams.select("__h", "__id")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= 2)
        .select("__h")
    )
    dup = grams.join(shared, "__h", "left_semi")
    w = Window.partitionBy("__id").orderBy("__pos")
    runs = (
        dup.withColumn("__grp", F.col("__pos") - F.row_number().over(w))
        .groupBy("__id", "__grp")
        .agg(F.min("__pos").alias("__start"), F.count(F.lit(1)).alias("__run"))
        .filter(F.col("__run") >= min_run)
    )
    covered = runs.select(
        "__id",
        F.explode(
            F.sequence(
                F.col("__start"), F.col("__start") + F.col("__run") + F.lit(n - 2)
            )
        ).alias("__tpos"),
    ).distinct()
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("__tpos", "__tok"),
    )
    rebuilt = (
        toks.join(covered, ["__id", "__tpos"], "left_anti")
        .groupBy("__id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__tpos", "__tok"))),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("__kept"),
        )
    )
    return (
        df.select(
            F.col(id_col),
            F.size(ws_tokens(F.col(text_col))).alias("__ntok"),
        )
        .join(rebuilt.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("__ntok") - F.coalesce(F.col("__kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def ngram_decontaminate(
    train: DataFrame,
    contamination: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    broadcast_taint: bool = True,
) -> DataFrame:
    """GPT-3-style n-gram-overlap decontamination (Brown et al. 2020,
    appendix C): drop every training row that shares ANY token
    ``n``-gram with the contamination (eval/benchmark) set.  Stricter
    than :func:`exact_decontaminate` (substring overlap counts) and
    cheaper than :func:`minhash_decontaminate` (no signatures, no
    banding) — the standard middle ground for benchmark leakage.

    Grams travel as md5-int60 hashes (8 bytes, not strings); the taint
    side is distinct gram hashes — benchmark-sized, broadcast by
    default, so the corpus side is ONE scan + map-side semi join with
    no shuffle of corpus data (set ``broadcast_taint=False`` for a
    contamination set too large to broadcast).  Documents shorter than
    ``n`` tokens contribute their whole text as one gram (exact match
    of a short doc still counts as contamination)."""
    taint = _gram_hashes(contamination, text_col, n)
    if broadcast_taint:
        taint = F.broadcast(taint)
    corp = _gram_hashes(train, text_col, n, id_col=id_col)
    tainted = corp.join(taint, "__h", "left_semi").select(id_col).distinct()
    return train.join(tainted, id_col, "left_anti")


def _gram_hashes(
    df: DataFrame, text_col: str, n: int, id_col: str | None = None
) -> DataFrame:
    """Token n-grams as md5-int60 hash rows — the SHARED gram pipeline
    of :func:`ngram_decontaminate` and :func:`bloom_decontaminate`
    (their result-equality guarantee depends on both paths hashing the
    identical gram stream, so there is exactly one construction).
    Without ``id_col``: distinct taint hashes (__h).  With ``id_col``:
    per-document distinct gram hashes (id_col, __h)."""
    if id_col is None:
        return (
            df.select(
                F.explode(_token_ngrams(F.col(text_col), n)).alias("__g")
            )
            .select(md5_int60(F.col("__g")).alias("__h"))
            .distinct()
        )
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_token_ngrams(F.col(text_col), n))).alias(
            "__g"
        ),
    ).select(id_col, md5_int60(F.col("__g")).alias("__h"))


def exact_decontaminate(
    train: DataFrame, contamination: DataFrame, text_col: str
) -> DataFrame:
    """Drop training rows whose text exactly matches any contamination
    (eval/benchmark) row — broadcast-able anti-join on the md5 digest."""
    taint = contamination.select(F.md5(F.col(text_col)).alias("__h")).distinct()
    return (
        train.withColumn("__h", F.md5(F.col(text_col)))
        .join(taint, "__h", "left_anti")
        .drop("__h")
    )


def minhash_decontaminate(
    train: DataFrame,
    contamination: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    shingle: int = 5,
    threshold: float = 0.5,
    bucket_cap: int = 512,
) -> DataFrame:
    """Test-set decontamination: drop training rows that NEAR-duplicate
    any contamination row (MinHash-LSH blocking over the tagged union,
    cross-source pairs only, exact-Jaccard verified).

    Ids are composite-encoded (id·2 + source) so the two datasets need
    not share an id space; the source tag rides the slim blocking rows
    (1 byte) and pairs within the same dataset are discarded before
    verification — a train-vs-train duplicate is NOT contamination.

    The encoding is integer arithmetic end to end (encode ·2, decode via
    an arithmetic shift), so it is exact over the full long range; a
    non-integral id column would silently truncate, so it raises."""
    _INTEGRAL = ("tinyint", "smallint", "int", "bigint")
    for side, frame in (("train", train), ("contamination", contamination)):
        dtype = dict(frame.dtypes)[id_col]
        if dtype not in _INTEGRAL:
            raise TypeError(
                f"minhash_decontaminate needs an integral id column; "
                f"{side}[{id_col!r}] is {dtype} — hash or dense-rank it "
                f"to a long first"
            )
    uid = (F.col(id_col).cast("long") * 2)
    a = train.select(uid.alias("__uid"), F.col(text_col).alias("__text"))
    b = contamination.select(
        (F.col(id_col) * 2 + 1).cast("long").alias("__uid"),
        F.col(text_col).alias("__text"),
    )
    u = ensure_parallelism(a.unionAll(b))
    logger.info(
        "minhash_decontaminate: k=%d bands=%d bucket_cap=%d", k, bands, bucket_cap
    )
    slim = minhash_band_buckets(u, "__text", "__uid", k, bands, shingle)
    pairs = _bucket_pairs(slim, bucket_cap).filter(
        (F.col("id_a") % 2) != (F.col("id_b") % 2)
    )
    payload = u.select(
        F.col("__uid").alias("__id"),
        F.array_distinct(shingles(F.col("__text"), shingle)).alias("__sh"),
    )
    cand = _join_payload(_join_payload(pairs, payload, "a"), payload, "b")
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size(F.array_union("__sh_a", "__sh_b"))
    verified = cand.filter(F.round(inter / union, 6) >= threshold)
    tainted = (
        verified.select(
            F.when(F.col("id_a") % 2 == 0, F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("__uid")
        )
        .distinct()
        # arithmetic shift = floor division by 2: exact for every long,
        # unlike float `/` which loses ids above 2^53
        .select(F.shiftright(F.col("__uid"), 1).alias(id_col))
    )
    return train.join(tainted, id_col, "left_anti")


def minhash_dedup_transitive(
    df: DataFrame, text_col: str, id_col: str, **kwargs
) -> DataFrame:
    """MinHash dedup with full transitive closure: only the min-id member
    of each duplicate component survives."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    comp = dedup_components(pairs)
    losers = comp.filter(F.col("id") != F.col("canonical")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality_col: str,
    max_iter: int = 20,
) -> DataFrame:
    """Component dedup that keeps the HIGHEST-QUALITY member of each
    duplicate cluster (ties -> smallest id) instead of the smallest id.

    Production pipelines rank duplicates (longest text, best quality
    score, freshest crawl) — min-id survivor selection throws that
    signal away.  Built on :func:`dedup_components`; the extra cost is
    one join of the (tiny) component membership against the quality
    column and one per-component struct-max — nothing corpus-sized.
    Requires a NUMERIC id (the tie-break negates it)."""
    comp = dedup_components(pairs, max_iter=max_iter)
    member = comp.join(
        df.select(
            F.col(id_col).alias("id"),
            F.col(quality_col).cast("double").alias("__q"),
        ),
        "id",
    )
    best = member.groupBy("canonical").agg(
        F.max(
            F.struct(F.col("__q"), (-F.col("id")).alias("__negid"))
        ).alias("__b")
    )
    keepers = best.select((-F.col("__b.__negid")).alias("id"))
    dropped = comp.join(keepers, "id", "left_anti").select(
        F.col("id").alias(id_col)
    )
    return df.join(dropped, id_col, "left_anti")


def bloom_decontaminate(
    train: DataFrame,
    contamination: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    m_bits: int | None = None,
    k_hashes: int | None = None,
    fp_rate: float = 0.01,
) -> DataFrame:
    """:func:`ngram_decontaminate` for a contamination set too large to
    broadcast EXACTLY — the two-phase Bloom plan, result IDENTICAL by
    construction:

    1. build an ``m_bits``-bit Bloom filter over the taint gram hashes
       (fixed size no matter how many benchmark/eval grams — the thing
       the exact broadcast cannot promise), and probe every corpus gram
       MAP-SIDE via :func:`..operators.sketches.bloom_contains_inline`
       (k broadcast word-joins, zero corpus shuffle);
    2. exact semi-join ONLY the surviving "maybe" grams against the
       taint hashes — the shuffle is bounded at true-hits +
       fp_rate · corpus-grams instead of every corpus gram.

    Bloom has no false negatives, so phase 1 never drops a real
    contamination; phase 2 kills the false positives, so the kept set
    equals the exact path's.

    Sizing (VERDICT r7 #4): by default (``m_bits=None``) the filter is
    AUTO-SIZED — one ``approx_count_distinct`` over the taint grams
    feeds :func:`..operators.sketches.bloom_size_for` at ``fp_rate``,
    so a 10x-bigger benchmark set gets a 10x-bigger filter instead of
    silently saturating (the r7 rehearsal measured a fixed filter going
    4.8%% → 99%% FP at 10x taint, degrading phase 1 to a no-op while
    staying correct).  An explicit ``m_bits`` is honored as before
    (``k_hashes`` then defaults to 5) — and either way the built
    filter's bits-set ratio is checked: above 75%% a ``UserWarning``
    names the saturation and the auto-size fix, so the silent-degrade
    mode is now visible (an OPTIMALLY sized filter sits at ~50%% fill —
    ``k = (m/n)·ln2`` sets half the bits by design — so 75%% cleanly
    separates "as designed" from "undersized", and the r7 rehearsal's
    failure mode reads ~99%%).  The filter frame is persisted (≤ m_bits/64
    rows by construction) so the saturation check and the k broadcast
    probes share one materialization."""
    import math
    import warnings

    from .sketches import bloom_build, bloom_contains_inline, bloom_size_for

    # the SAME gram pipeline as ngram_decontaminate (_gram_hashes) —
    # the result-equality guarantee depends on it; the Bloom value is
    # the hash's string form (md5 hashes strings)
    taint = _gram_hashes(contamination, text_col, n).select(
        F.col("__h").cast("string").alias("__h")
    )
    if m_bits is None:
        n_taint = taint.agg(
            F.approx_count_distinct("__h").alias("n")
        ).first()["n"]
        auto_m, auto_k = bloom_size_for(max(1, int(n_taint)), fp_rate)
        m_bits = auto_m
        if k_hashes is None:
            k_hashes = auto_k
    elif k_hashes is None:
        k_hashes = 5
    bf = bloom_build(taint, "__h", m_bits=m_bits, k_hashes=k_hashes)
    # eager localCheckpoint, not persist: one materialization shared by
    # the saturation probe and the k broadcast probes, AND the blocks
    # are reclaimed by the ContextCleaner when the frame is GC'd — a
    # persist() here leaked one cached filter per call for the session
    # lifetime (review r8)
    bf = bf.localCheckpoint()
    set_bits = bf.agg(F.sum(F.bit_count("bits")).alias("s")).first()["s"] or 0
    fill = set_bits / float(m_bits)
    if fill > 0.75:
        est_fp = (fill ** k_hashes) if k_hashes else 1.0
        warnings.warn(
            f"bloom_decontaminate: filter is {fill:.0%} full "
            f"(m_bits={m_bits}, ~{est_fp:.0%} false-positive rate) — "
            "phase 1 is degrading toward a no-op (result stays exact, "
            "but the phase-2 shuffle approaches the exact path's). "
            "Pass m_bits=None to auto-size from the taint cardinality, "
            f"or size via bloom_size_for(n_taint, fp_rate) "
            f"(needs ~{int(-math.log(0.01) / math.log(2.0) ** 2)} bits "
            "per distinct taint gram at 1% FP).",
            UserWarning,
            stacklevel=2,
        )
    corp = _gram_hashes(train, text_col, n, id_col=id_col).select(
        id_col, F.col("__h").cast("string").alias("__h")
    )
    maybe = bloom_contains_inline(
        corp, bf, "__h", m_bits=m_bits, k_hashes=k_hashes
    ).where(F.col("maybe_present"))
    tainted = (
        maybe.join(taint, "__h", "left_semi").select(id_col).distinct()
    )
    return train.join(tainted, id_col, "left_anti")


def novelty_scores(
    df: DataFrame,
    reference: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    fp_rate: float | None = None,
    m_bits: int | None = None,
    k_hashes: int | None = None,
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus: for each
    document, how many of its distinct token n-grams do NOT appear
    anywhere in ``reference`` — the curation metric for "how new is
    this shard" (near-zero novelty = boilerplate /近-duplicate mass;
    it is the set-level complement of the decontamination family and
    shares its exact gram pipeline, so scores are comparable across
    both).

    Returns (id_col, n_grams, n_novel, novelty) with ``novelty =
    n_novel / n_grams`` as a double (NULL when a document has no
    grams — such documents, and rows with NULL text, do not appear).

    Plans:

    * default (``fp_rate``/``m_bits`` unset): per-doc distinct gram
      hashes LEFT-ANTI the reference's distinct gram set — one gram-
      keyed shuffle, exact.
    * Bloom-prefiltered (set ``fp_rate`` for auto-sizing via
      ``bloom_size_for``, or explicit ``m_bits``/``k_hashes``): the
      reference set becomes an m-bit filter probed MAP-SIDE
      (``bloom_contains_inline`` — zero shuffle of the corpus grams);
      "definitely absent" grams are novel WITHOUT any join (Bloom has
      no false negatives), and only the "maybe present" remainder
      reaches the exact anti-join — the same two-phase shape as
      :func:`bloom_decontaminate`, result IDENTICAL by construction.
      This is the corpus path: most grams of genuinely novel text
      resolve map-side."""
    from .sketches import bloom_build, bloom_contains_inline, bloom_size_for

    doc_grams = _gram_hashes(df, text_col, n, id_col=id_col)
    totals = doc_grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    ref = _gram_hashes(reference, text_col, n)
    if fp_rate is None and m_bits is None:
        novel = doc_grams.join(ref, "__h", "left_anti")
    else:
        ref_s = ref.select(F.col("__h").cast("string").alias("__h"))
        if m_bits is None:
            n_ref = ref_s.agg(
                F.approx_count_distinct("__h").alias("n")
            ).first()["n"]
            m_bits, auto_k = bloom_size_for(
                max(1, int(n_ref)), fp_rate or 0.01
            )
            if k_hashes is None:
                k_hashes = auto_k
        elif k_hashes is None:
            k_hashes = 5
        bf = bloom_build(
            ref_s, "__h", m_bits=m_bits, k_hashes=k_hashes
        ).localCheckpoint()  # one reference-gram pass for all k probes
        probed = bloom_contains_inline(
            doc_grams.withColumn("__hs", F.col("__h").cast("string")),
            bf,
            "__hs",
            m_bits=m_bits,
            k_hashes=k_hashes,
        )
        definite = probed.where(~F.col("maybe_present")).select(
            id_col, "__h"
        )
        maybe = probed.where(F.col("maybe_present")).select(id_col, "__h")
        novel = definite.unionByName(maybe.join(ref, "__h", "left_anti"))
    novels = novel.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    return totals.join(novels, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        (
            F.coalesce("n_novel", F.lit(0)).cast("double")
            / F.col("n_grams")
        ).alias("novelty"),
    )


def containment_join(
    queries: DataFrame,
    corpus: DataFrame,
    q_id: str,
    q_text: str,
    c_id: str,
    c_text: str,
    n: int = 8,
    threshold: float = 0.5,
    max_gram_df: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT join: emit (query, corpus-doc)
    pairs where

        containment = |grams(q) ∩ grams(c)| / |grams(q)| ≥ threshold

    over distinct token ``n``-grams — the verbatim-inclusion detector
    (which corpus documents contain most of this benchmark prompt /
    quote / license block?).  One-sided by design: a long document
    that swallows a short query scores 1.0 on that query while its
    Jaccard similarity is near 0 — the case the symmetric dedup
    family (minhash/ngram_jaccard) structurally misses.  Directional
    complement of ngram_decontaminate (which flags and drops; this
    SCORES and returns the pairs, queries-side denominators).

    The threshold compare is exact-integer at per-mille resolution:
    ``1000·m ≥ round(1000·threshold)·|grams(q)|`` — no float boundary
    cross-engine; the emitted ``containment`` double is the one
    display-only division.  Self-pairs (same id value) are NOT
    filtered — callers probing a corpus against itself exclude them
    on id.

    Scale shape: grams travel as 60-bit md5 ints (slim shuffle, the
    decontamination family's collision budget applies); the gram
    equi-join IS the inverted index — never a doc×doc cross join; the
    per-pair GROUP BY output is bounded by true near-containment
    pairs.  ``max_gram_df`` drops grams appearing in more than that
    many corpus documents BEFORE the join (the hot-gram guard for
    boilerplate n-grams — lowers recall one-sidedly, documented trade
    like fuzzy_join's ``max_block``).

    Reference parity: the reference engine exposes no containment
    operator; spec follows the standard set-containment-join
    literature (e.g. PPJoin/containment variants, Xiao et al.
    WWW'08) restricted to the exact-count form."""
    thr = int(round(1000 * threshold))
    qg = queries.select(
        F.col(q_id).alias("__qid"),
        F.explode(
            F.array_distinct(_token_ngrams(F.col(q_text), n))
        ).alias("__g"),
    ).select("__qid", md5_int60(F.col("__g")).alias("__h"))
    qn = qg.groupBy("__qid").agg(F.count(F.lit(1)).alias("__qn"))
    cg = corpus.select(
        F.col(c_id).alias("__cid"),
        F.explode(
            F.array_distinct(_token_ngrams(F.col(c_text), n))
        ).alias("__g"),
    ).select("__cid", md5_int60(F.col("__g")).alias("__h"))
    if max_gram_df is not None:
        hot = (
            cg.groupBy("__h")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_gram_df)
            .select("__h")
        )
        cg = cg.join(hot, "__h", "left_anti")
    m = (
        qg.join(cg, "__h")
        .groupBy("__qid", "__cid")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    out = m.join(qn, "__qid").where(
        F.lit(1000) * F.col("__m") >= F.lit(thr) * F.col("__qn")
    )
    return out.select(
        F.col("__qid").alias(q_id),
        F.col("__cid").alias(c_id),
        F.col("__m").cast("long").alias("n_shared"),
        F.col("__qn").cast("long").alias("n_query_grams"),
        F.round(
            F.col("__m").cast("double") / F.col("__qn").cast("double"),
            round_digits,
        ).alias("containment"),
    )
