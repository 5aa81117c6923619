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

At 100 TB: every strategy is (signature scan) + (groupBy/band shuffle)
+ (bounded candidate join).  Nothing collects to the driver; canonical
selection is min-id within a duplicate group (single-link, one hop —
iterate for transitive closure if needed).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import ensure_parallelism, md5_int32, md5_int60, shingles, ws_tokens

__all__ = [
    "exact_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "minhash_dedup_transitive",
    "dedup_components",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_dup_pairs",
]


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


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    shingle: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Verified near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    shingle→minhash→band→bucket-join: rows are exploded to ``bands``
    rows keyed by the md5 of their band slice; the self-join happens per
    bucket only.  Candidates are verified with exact shingle-set Jaccard.
    """
    assert k % bands == 0, "k must divide into equal bands"
    rows = k // bands
    df = ensure_parallelism(df)
    # one shingle pass: the distinct shingle set feeds BOTH the signature
    # (min over a set == min over the multiset) and the exact-Jaccard
    # verification; hashing only distinct shingles also halves the md5
    # work on repetitive text
    base = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingles(F.col(text_col), shingle)).alias("__sh"),
    ).select(
        "__id",
        "__sh",
        minhash_signature_from_shingles(F.col("__sh"), k).alias("__sig"),
    )
    banded = base.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",", *[F.element_at("__sig", b * rows + r + 1) for r in range(rows)]
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__bucket"),
    )
    # self-join: materialize once instead of re-deriving signatures for
    # both sides (MEMORY_AND_DISK — spills rather than recomputes at scale)
    banded = banded.persist()
    left = banded.alias("L")
    right = banded.alias("R")
    cand = (
        left.join(
            right,
            (F.col("L.__band") == F.col("R.__band"))
            & (F.col("L.__bucket") == F.col("R.__bucket"))
            & (F.col("L.__id") < F.col("R.__id")),
        )
        .select(
            F.col("L.__id").alias("id_a"),
            F.col("R.__id").alias("id_b"),
            F.col("L.__sh").alias("__sh_a"),
            F.col("R.__sh").alias("__sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
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
    """Pack the per-bit majority vote of pre-hashed tokens into a BIGINT."""
    n = F.size(hashes)

    def bit_sum(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)),
        )

    return sum(
        (F.when(bit_sum(b) * 2 > n, F.lit(2**b).cast("long")).otherwise(F.lit(0)))
        for b in range(_SIMHASH_BITS)
    ).cast("long")


def simhash(col: Column) -> Column:
    """60-bit SimHash over whitespace tokens: per-bit majority vote of
    md5-hashed tokens, packed into a BIGINT.  Convenience form — prefer
    materializing :func:`token_hashes` first on big data."""
    return simhash_from_hashes(token_hashes(col))


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, bands: int = 4, max_hamming: int = 8
) -> DataFrame:
    """Candidate near-dup pairs: equal 15-bit SimHash band (pigeonhole for
    Hamming distance < bands), verified by exact popcount distance."""
    width = _SIMHASH_BITS // bands
    df = ensure_parallelism(df)
    base = df.select(
        F.col(id_col).alias("__id"), token_hashes(F.col(text_col)).alias("__hs")
    ).select("__id", simhash_from_hashes(F.col("__hs")).alias("__sh"))
    banded = base.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sh"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias(f"b{b}")
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__chunk"),
    )
    banded = banded.persist()
    L, R = banded.alias("L"), banded.alias("R")
    cand = (
        L.join(
            R,
            (F.col("L.__band") == F.col("R.__band"))
            & (F.col("L.__chunk") == F.col("R.__chunk"))
            & (F.col("L.__id") < F.col("R.__id")),
        )
        .select(
            F.col("L.__id").alias("id_a"),
            F.col("R.__id").alias("id_b"),
            F.col("L.__sh").alias("__ha"),
            F.col("R.__sh").alias("__hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact token-n-gram Jaccard over candidates sharing ≥1 n-gram
    (inverted-index blocking).  For heavy-tailed n-gram frequencies at
    scale, prefer :func:`minhash_lsh_pairs`; this is the exact verifier."""
    toks = ws_tokens(F.col(text_col))
    grams = F.when(F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"), F.array_distinct(grams).alias("__g")
    )
    inv = base.select("__id", "__g", F.explode("__g").alias("__gram")).persist()
    L, R = inv.alias("L"), inv.alias("R")
    cand = (
        L.join(
            R,
            (F.col("L.__gram") == F.col("R.__gram"))
            & (F.col("L.__id") < F.col("R.__id")),
        )
        .select(
            F.col("L.__id").alias("id_a"),
            F.col("R.__id").alias("id_b"),
            F.col("L.__g").alias("__ga"),
            F.col("R.__g").alias("__gb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = F.round(
        F.size(F.array_intersect("__ga", "__gb"))
        / F.size(F.array_union("__ga", "__gb")),
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
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Random-hyperplane LSH: ``n_planes`` signed projections → ``bands``
    buckets; pairs sharing a bucket get exact cosine verification.
    Hyperplanes are seeded and inlined as literals (broadcast-free)."""
    assert n_planes % bands == 0
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = [
        (_dot(v, F.array(*[F.lit(float(x)) for x in planes[p]])) > 0).cast("int")
        for p in range(n_planes)
    ]
    width = n_planes // bands
    base = df.select(
        F.col(id_col).alias("__id"),
        v.alias("__v"),
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
    base = base.persist()
    L, R = base.alias("L"), base.alias("R")
    cand = (
        L.join(
            R,
            (F.col("L.__band") == F.col("R.__band"))
            & (F.col("L.__bucket") == F.col("R.__bucket"))
            & (F.col("L.__id") < F.col("R.__id")),
        )
        .select(
            F.col("L.__id").alias("id_a"),
            F.col("R.__id").alias("id_b"),
            F.col("L.__v").alias("__va"),
            F.col("R.__v").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = _dot(F.col("__va"), F.col("__vb")) / (
        F.sqrt(_dot(F.col("__va"), F.col("__va")))
        * F.sqrt(_dot(F.col("__vb"), F.col("__vb")))
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
    for _ in range(max_iter):
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
        changed = (
            updated.withColumnRenamed("label", "new_label")
            .join(labels.withColumnRenamed("id", "id2"), F.col("id") == F.col("id2"))
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("canonical"))


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
