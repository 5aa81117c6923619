"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k: one full scan, JVM-side
  ``zip_with``/``aggregate`` dot products, distributed TakeOrdered (no
  driver-side sort of the full table).  The correctness baseline.
* :func:`ann_ivf_topk` — IVF (inverted-file) ANN: k-means centroids fit
  on a driver sample, every vector assigned to its nearest centroid
  (pure Column argmax), probes only ``nprobe`` nearest lists.  The scale
  path: at 100 TB the assignment is a narrow projection and the probe
  filter prunes ~(1 - nprobe/nlist) of the data before any distance math;
  persist/partition by ``__cluster`` to make the pruning physical.
* :func:`ann_lsh_topk` — random-hyperplane LSH bucketing with exact
  rerank inside candidate buckets (same family as
  :func:`dedup.embedding_dup_pairs`).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cosine_topk",
    "cosine_topk_batch",
    "quantized_cosine_topk_batch",
    "ann_recall_at_k",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "kmeans_np",
    "kmeans_fit",
    "kmeans_fit_distributed",
    "assign_clusters",
    "IVFIndex",
    "ivf_index_load",
    "ivf_index_add",
    "quantize_int8",
    "quantize_int8_py",
    "quantized_cosine_topk",
    "pq_train_np",
    "pq_encode",
    "pq_topk",
    "ann_ivfpq_topk",
    "ann_pca_topk",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _lit_vec(v: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _cosine(vec: Column, q: Sequence[float]) -> Column:
    qn = float(np.linalg.norm(q))
    qv = _lit_vec(np.asarray(q) / qn if qn else q)
    return _dot(vec, qv) / F.sqrt(_dot(vec, vec))


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k (deterministic order: score desc, id asc)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        df.select(
            F.col(id_col),
            F.round(_cosine(v, query), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def _batch_topk(
    scored: DataFrame,
    score_col: str,
    id_col: str,
    k: int,
    query_col: str,
) -> DataFrame:
    """Per-query top-k over a (query, id, score) frame — the batched twin
    of the single-query ``orderBy(score desc, id).limit(k)``: a
    row_number window over the same total order, filtered to ``<= k``.
    Spark rewrites the rank filter into a WindowGroupLimit that keeps at
    most k rows per query on the MAP side, so the exchange ships
    O(k · n_queries) rows per task, never the corpus — the batched
    analogue of TakeOrdered's partial top-k.  Row SET per query is
    identical to the single-query form (the order is total: unique
    ids break score ties)."""
    from pyspark.sql import Window

    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.lit(int(k)))
        .select(query_col, id_col, score_col)
    )


def cosine_topk_batch(
    df: DataFrame,
    queries: "Sequence[Sequence[float]]",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_col: str = "qid",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of probe queries in ONE corpus scan
    (r14, guide §1.2 — the per-query :func:`cosine_topk` loop re-scanned
    the corpus once per probe): every query's score is computed in the
    same projection (identical expression to the single-query row, so
    scores are bit-identical), exploded to (query, id, score), and cut
    per query by :func:`_batch_topk`.  Returns (query_col, id, score)
    with query ids 0..len(queries)-1; per query the row set equals
    ``cosine_topk(df, queries[i], k)``."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    entries = [
        F.struct(
            F.lit(i).alias(query_col),
            F.round(_cosine(v, q), 6).alias("score"),
        )
        for i, q in enumerate(queries)
    ]
    scored = df.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("__e")
    ).select(
        F.col(f"__e.{query_col}").alias(query_col),
        F.col(id_col),
        F.col("__e.score").alias("score"),
    )
    return _batch_topk(scored, "score", id_col, k, query_col)


def kmeans_np(
    X: np.ndarray, nlist: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Plain Lloyd k-means on an in-memory matrix (the shared driver-side
    core — also used by the SQL-oracle factory so both engines bake the
    same centroid bits)."""
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for c in range(len(cent)):
            pts = X[assign == c]
            if len(pts):
                cent[c] = pts.mean(0)
    return cent


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    nlist: int,
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd k-means on a seeded RANDOM driver sample → (nlist, dim)
    centroids.  A plain ``limit(sample)`` would take the first partitions
    only — on partition-correlated data (any real 100 TB layout) the
    centroids would train on one shard's distribution and recall would
    collapse, so we sample uniformly (parquet count is metadata-cheap)."""
    n = df.count()
    sampled = df.select(vec_col)
    if n > sample:
        # oversample slightly so the post-sample limit rarely undershoots
        sampled = sampled.sample(
            withReplacement=False, fraction=min(1.0, 1.2 * sample / n), seed=seed
        )
    rows = sampled.limit(sample).collect()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    return kmeans_np(X, nlist, iters=iters, seed=seed)


# expression-tree cells (nlist × dim) above which assignment switches from
# inlined literals to a broadcast single-row join — the Catalyst tree for
# the literal form is O(nlist·dim) and explodes at e.g. nlist=4096/dim=768
_MAX_INLINE_CELLS = 4096


def _assign_expr(vec: Column, centroids: np.ndarray) -> Column:
    """argmin ||v - c||² == argmax (v·c - ||c||²/2) — pure Column expr
    with inlined centroid literals (small nlist·dim only)."""
    scores = F.array(
        *[
            _dot(vec, _lit_vec(c)) - F.lit(float(c @ c) / 2.0)
            for c in centroids
        ]
    )
    return F.array_position(scores, F.array_max(scores)).cast("int") - 1


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    out_col: str = "__cluster",
    max_inline_cells: int = _MAX_INLINE_CELLS,
) -> DataFrame:
    """Nearest-centroid assignment, scale-adaptive: small centroid sets
    are inlined as literals (whole-stage codegen friendly); large ones
    ride a broadcast single-row join so the plan stays O(1) in nlist·dim
    and the matrix ships to executors once, not per-expression."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if centroids.size <= max_inline_cells:
        return df.withColumn(out_col, _assign_expr(v, centroids))
    spark = df.sparkSession
    cents = [[float(x) for x in c] for c in centroids]
    norms = [float(c @ c) / 2.0 for c in centroids]
    aux = spark.createDataFrame(
        [(cents, norms)], "__cents array<array<double>>, __cnorm2 array<double>"
    )
    scores = F.zip_with(
        F.col("__cents"), F.col("__cnorm2"), lambda c, n: _dot(v, c) - n
    )
    return (
        df.crossJoin(F.broadcast(aux))
        .withColumn(
            out_col,
            F.array_position(scores, F.array_max(scores)).cast("int") - 1,
        )
        .drop("__cents", "__cnorm2")
    )


def ann_ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` centroid lists nearest to the query,
    exact cosine rerank inside them.  Pass precomputed ``centroids`` (and
    a DataFrame persisted with its ``__cluster`` assignment) to amortize
    index build across queries."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if centroids is None:
        centroids = kmeans_fit(df, vec_col, nlist)
    q = np.asarray(query, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(1)
    probes = [int(i) for i in d2.argsort()[:nprobe]]
    assigned = assign_clusters(df, vec_col, centroids)
    cand = assigned.filter(F.col("__cluster").isin(probes))
    return (
        cand.select(F.col(id_col), F.round(_cosine(v, query), 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def ann_lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_planes: int = 12,
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Hyperplane-LSH ANN: candidates whose signature is within
    ``max_hamming`` bits of the query's, exact rerank."""
    if dim is None:
        dim = len(query)
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = np.asarray(query, dtype=np.float64)
    qbits = (planes @ q > 0).astype(int)
    ham = sum(
        (
            (_dot(v, _lit_vec(planes[p])) > 0).cast("int") != F.lit(int(qbits[p]))
        ).cast("int")
        for p in range(n_planes)
    )
    cand = df.filter(ham <= max_hamming)
    return (
        cand.select(F.col(id_col), F.round(_cosine(v, query), 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def _idot(a: Column, b: Column) -> Column:
    """Exact integer dot product (int64 accumulate — order-independent,
    so unlike the float fold it needs no sequential-order discipline)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantize_int8(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization:
    ``scale = max|x|/127``, ``q_i = round(x_i/scale)`` ∈ [-127, 127] —
    (id, qvec array<int>, scale).  4× smaller than float32 at rest
    (16× vs the float64 math path), which at 100 TB turns a scan-bound
    ANN rerank into a quarter of the I/O; cosine over the quantized
    ints needs no dequantization because the per-vector scales cancel.

    The scale is lambda-bound (transform over a 1-element array) so the
    ``array_max`` runs once per vector, not once per element — the same
    no-CSE trap as quality_filter (BASELINE.md perf note 1).  Rounding
    is HALF_UP (away from zero), matching DuckDB's ``round()``.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def with_scale(s: Column) -> Column:
        return F.struct(
            F.transform(v, lambda x: F.round(x / s).cast("int")).alias("qvec"),
            s.alias("scale"),
        )

    amax = F.array_max(F.transform(v, F.abs))
    # Guard on the COMPUTED scale, not the max (r12 fuzz find, fixed
    # r13): amax/127.0 underflows to exactly 0.0 for subnormal maxima
    # below ~127*DBL_MIN_SUBNORMAL although amax > 0 — the scale is the
    # thing that must be positive.  Mirrors quantize_int8_py and the
    # SQL twin (queries._quantized_topk_oracle).
    raw_scale = amax / F.lit(127.0)
    scale = F.when(raw_scale > 0, raw_scale).otherwise(F.lit(1.0))
    q = F.get(F.transform(F.array(scale), with_scale), 0)
    return df.select(
        F.col(id_col),
        q["qvec"].alias("qvec"),
        q["scale"].alias("scale"),
    )


def quantize_int8_py(vec: Sequence[float]) -> list[int]:
    """Driver-side twin of :func:`quantize_int8` for query vectors
    (explicit half-away-from-zero to match Spark/DuckDB ``round``;
    Python's built-in round is half-even).

    Subnormal guard (found by the r12 property fuzz): when every |x|
    is below ~127 × DBL_MIN_SUBNORMAL, ``amax / 127.0`` UNDERFLOWS to
    exactly 0.0 although ``amax > 0`` — the scale, not the max, is the
    thing that must be positive.  Such a vector quantizes to all-zero
    codes (norm 0), the same class the cosine paths already drop.  As
    of r13 all three twins key the fallback on the computed scale:
    this kernel, the Spark expression (:func:`quantize_int8`), and the
    SQL oracle (queries._quantized_topk_oracle) — the registered
    quantized row re-entered the driver window for the hygiene round
    when the plan-pinned expressions changed."""
    import math

    amax = max(abs(float(x)) for x in vec)
    scale = amax / 127.0
    if not scale > 0:
        scale = 1.0
    return [
        int(math.copysign(math.floor(abs(float(x) / scale) + 0.5), x))
        for x in vec
    ]


def quantized_cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors: the
    per-vector scales cancel in the cosine, so the score is
    ``Σq_d·q_q / (√Σq_d² · √Σq_q²)`` — all-integer dot products (exact
    in any engine, any order) with one float division at the end.
    Max quantization error ≈ 1/127 per axis; rank agreement with the
    exact float path is near-total except between near-tied scores.
    All-zero vectors (quantized norm 0) are dropped rather than scored
    NaN."""
    qq = quantize_int8_py(query)
    qqv = F.array(*[F.lit(int(x)) for x in qq])
    qq_norm = float(np.sqrt(sum(x * x for x in qq)))
    quant = quantize_int8(df, vec_col, id_col)
    self2 = _idot(F.col("qvec"), F.col("qvec"))
    score = F.round(
        _idot(F.col("qvec"), qqv)
        / (F.sqrt(self2.cast("double")) * F.lit(qq_norm)),
        6,
    )
    return (
        quant.filter(self2 > 0)
        .select(F.col(id_col), score.alias("qscore"))
        .orderBy(F.desc("qscore"), F.col(id_col))
        .limit(k)
    )


def quantized_cosine_topk_batch(
    df: DataFrame,
    queries: "Sequence[Sequence[float]]",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_col: str = "qid",
) -> DataFrame:
    """Batched :func:`quantized_cosine_topk` — ONE quantization pass
    over the corpus shared by every probe query (r14, guide §1.2): the
    per-vector qvec/self-norm and the ``self2 > 0`` drop are
    query-independent, so they compute once; each probe contributes its
    own integer-dot score column (identical expression to the
    single-query row).  Returns (query_col, id, qscore); per query the
    row set equals ``quantized_cosine_topk(df, queries[i], k)``."""
    quant = quantize_int8(df, vec_col, id_col)
    self2 = _idot(F.col("qvec"), F.col("qvec"))
    entries = []
    for i, q in enumerate(queries):
        qq = quantize_int8_py(q)
        qqv = F.array(*[F.lit(int(x)) for x in qq])
        qq_norm = float(np.sqrt(sum(x * x for x in qq)))
        score = F.round(
            _idot(F.col("qvec"), qqv)
            / (F.sqrt(self2.cast("double")) * F.lit(qq_norm)),
            6,
        )
        entries.append(
            F.struct(F.lit(i).alias(query_col), score.alias("qscore"))
        )
    scored = (
        quant.filter(self2 > 0)
        .select(F.col(id_col), F.explode(F.array(*entries)).alias("__e"))
        .select(
            F.col(f"__e.{query_col}").alias(query_col),
            F.col(id_col),
            F.col("__e.qscore").alias("qscore"),
        )
    )
    return _batch_topk(scored, "qscore", id_col, k, query_col)


def pq_train_np(
    X: np.ndarray, m: int = 8, ksub: int = 16, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011): the vector is
    split into ``m`` contiguous subspaces and each gets its own
    ``ksub``-centroid Lloyd k-means → (m, ksub, dim/m).  Shares
    :func:`kmeans_np` (seeded per subspace) so the SQL-oracle factory
    can bake bit-identical codebooks from the same sample."""
    n, dim = X.shape
    assert dim % m == 0, "dim must divide evenly into m subspaces"
    dsub = dim // m
    return np.stack(
        [
            kmeans_np(
                np.ascontiguousarray(X[:, j * dsub:(j + 1) * dsub]),
                ksub, iters=iters, seed=seed + j,
            )
            for j in range(m)
        ]
    )


def _pq_codes_expr(vec: Column, codebooks: np.ndarray) -> Column:
    """Per-subspace nearest-centroid codes as one array<int> Column —
    argmin ||v_sub − c||² via the same argmax(v·c − ||c||²/2) trick as
    IVF assignment (first-max tie semantics in both engines)."""
    m, ksub, dsub = codebooks.shape
    codes = []
    for j in range(m):
        sub = F.slice(vec, j * dsub + 1, dsub)
        scores = F.array(
            *[
                _dot(sub, _lit_vec(c)) - F.lit(float(c @ c) / 2.0)
                for c in codebooks[j]
            ]
        )
        codes.append(
            (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
        )
    return F.array(*codes)


def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: np.ndarray,
) -> DataFrame:
    """Encode vectors to PQ codes: (id, codes array<int> of length m).
    At m=8, ksub=16 a 64-dim float32 vector (256 B) compresses to 8
    nibbles — 32× — which is what makes billion-vector rerank tables
    RAM-resident at 100 TB corpus scale.  Encoding is a narrow
    projection (inlined centroid literals; m·ksub·dsub cells ≤ the
    inline cap used by IVF assignment)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col), _pq_codes_expr(v, codebooks).alias("codes")
    )


def pq_topk(
    df: DataFrame,
    query: Sequence[float],
    codebooks: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance PQ search: the query stays exact; each coded
    vector scores as cos ≈ Σ_j T_num[j][code_j] / √(Σ_j T_norm[j][code_j])
    with both lookup tables precomputed driver-side from the codebooks
    (T_num = query_sub·centroid, T_norm = ‖centroid‖²) and inlined as
    literals — per row the score is m array lookups and one division,
    no vector math.  Left-fold summation order is fixed (j ascending)
    so the floats are bit-reproducible cross-engine.  Rows whose
    reconstruction norm is 0 are dropped rather than scored NaN."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    qu = q / qn if qn else q
    enc = pq_encode(df, vec_col, id_col, codebooks)
    num: Column = F.lit(0.0)
    den2: Column = F.lit(0.0)
    for j in range(m):
        cj = F.element_at(F.col("codes"), j + 1) + 1
        num_t = F.array(
            *[F.lit(float(qu[j * dsub:(j + 1) * dsub] @ c)) for c in codebooks[j]]
        )
        norm_t = F.array(*[F.lit(float(c @ c)) for c in codebooks[j]])
        num = num + F.element_at(num_t, cj)
        den2 = den2 + F.element_at(norm_t, cj)
    return (
        enc.withColumn("__den2", den2)
        .filter(F.col("__den2") > 0)
        .select(
            F.col(id_col),
            F.round(num / F.sqrt(F.col("__den2")), 6).alias("pq_score"),
        )
        .orderBy(F.desc("pq_score"), F.col(id_col))
        .limit(k)
    )


def ann_ivfpq_topk(
    df: DataFrame,
    query: Sequence[float],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF+PQ — the standard billion-scale ANN recipe (Jégou et al.
    2011; what FAISS calls IVFx,PQy): coarse centroids prune the corpus
    to ``nprobe``/``nlist`` lists, then PQ asymmetric-distance scoring
    ranks the survivors from their 8-nibble codes.  Composition of the
    two pruning axes this module already ships: the IVF filter cuts
    *rows* (partition pruning when the assignment is stored, see
    IVFIndex), PQ cuts *bytes per row* (32×) — together a probe touches
    ~nprobe/nlist of the corpus at 1/32nd the I/O of raw vectors."""
    q = np.asarray(query, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(1)
    probes = [int(i) for i in d2.argsort()[:nprobe]]
    assigned = assign_clusters(df, vec_col, centroids)
    cand = assigned.filter(F.col("__cluster").isin(probes)).drop("__cluster")
    return pq_topk(cand, query, codebooks, k=k, vec_col=vec_col, id_col=id_col)


class IVFIndex:
    """Persisted IVF index: build once (k-means + cluster assignment,
    materialized MEMORY_AND_DISK), search many times touching only
    ``nprobe``/``nlist`` of the data per query.

    At cluster scale, :meth:`save` writes the assigned vectors to
    parquet partitioned by ``__cluster`` and :func:`ivf_index_load`
    reopens them — the probe filter (``__cluster IN (literal ids)``)
    then becomes physical partition pruning: a search reads only the
    ``nprobe`` probed clusters' files, never the corpus.
    """

    def __init__(
        self,
        df: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        nlist: int = 16,
        seed: int = 42,
        _prebuilt: tuple | None = None,
    ):
        if _prebuilt is not None:
            self.vec_col, self.id_col, self.centroids, self.assigned = _prebuilt
            return
        self.vec_col = vec_col
        self.id_col = id_col
        self.centroids = kmeans_fit(df, vec_col, nlist, seed=seed)
        self.assigned = assign_clusters(df, vec_col, self.centroids).persist()

    def save(self, path: str) -> None:
        """Materialize to parquet: ``vectors/`` partitioned by cluster id
        (probe-time partition pruning) + the (nlist × dim) centroid
        matrix as one row per centroid."""
        self.assigned.write.partitionBy("__cluster").mode("overwrite").parquet(
            f"{path}/vectors"
        )
        spark = self.assigned.sparkSession
        cent = [
            (int(i), [float(x) for x in row], self.vec_col, self.id_col)
            for i, row in enumerate(self.centroids)
        ]
        spark.createDataFrame(
            cent,
            "cluster int, centroid array<double>, vec_col string, id_col string",
        ).write.mode("overwrite").parquet(f"{path}/centroids")

    def search(self, query: Sequence[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        q = np.asarray(query, dtype=np.float64)
        d2 = ((self.centroids - q[None, :]) ** 2).sum(1)
        probes = [int(i) for i in d2.argsort()[:nprobe]]
        v = F.transform(F.col(self.vec_col), lambda x: x.cast("double"))
        cand = self.assigned.filter(F.col("__cluster").isin(probes))
        return (
            cand.select(
                F.col(self.id_col), F.round(_cosine(v, query), 6).alias("score")
            )
            .orderBy(F.desc("score"), F.col(self.id_col))
            .limit(k)
        )

    def unpersist(self) -> None:
        self.assigned.unpersist()


def ivf_index_load(spark, path: str) -> IVFIndex:
    """Reopen an index written by :meth:`IVFIndex.save`; searches
    partition-prune the vectors scan to the probed clusters."""
    rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["cluster"],
    )
    centroids = np.array([r["centroid"] for r in rows], dtype=np.float64)
    assigned = spark.read.parquet(f"{path}/vectors")
    return IVFIndex(
        None,
        _prebuilt=(rows[0]["vec_col"], rows[0]["id_col"], centroids, assigned),
    )


def ivf_index_add(spark, path: str, new_df: DataFrame) -> IVFIndex:
    """Merge a batch of NEW vectors into a parquet-backed IVF index
    (:meth:`IVFIndex.save`) WITHOUT rebuilding: assign the batch to the
    EXISTING centroids (broadcast/inlined — one narrow pass over the
    batch only) and append into the cluster-partitioned layout, so
    probe-time partition pruning keeps working and old vectors are
    never rescanned.

    Centroids are frozen by design — the standard IVF maintenance
    contract (FAISS ``add`` after ``train``): recall degrades only if
    the new data's distribution drifts from the training sample, in
    which case rebuild.  Caller contract: new ids must not already be
    indexed.  Appending is new-files-only; a crash mid-append can leave
    a partial batch — re-apply after removing the batch's files.

    Returns the reopened index."""
    rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["cluster"],
    )
    centroids = np.array([r["centroid"] for r in rows], dtype=np.float64)
    vec_col, id_col = rows[0]["vec_col"], rows[0]["id_col"]
    if new_df.head(1):
        assign_clusters(new_df, vec_col, centroids).write.partitionBy(
            "__cluster"
        ).mode("append").parquet(f"{path}/vectors")
    return ivf_index_load(spark, path)


def kmeans_fit_distributed(
    df: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd k-means over the FULL table: each iteration is one scan
    (Column-expr assignment) + one posexplode/groupBy mean; only the
    (nlist × dim) centroid matrix ever reaches the driver.  Use instead
    of the sampled :func:`kmeans_fit` when nlist is large or the sample
    would miss rare clusters."""
    n = df.count()
    init_df = df.select(vec_col)
    if n > nlist:
        # seeded uniform init — limit() alone would take one shard's rows
        init_df = init_df.sample(
            withReplacement=False, fraction=min(1.0, (nlist * 3 + 64) / n), seed=seed
        )
    init = init_df.limit(nlist).collect()
    cent = np.asarray([r[0] for r in init], dtype=np.float64)
    if len(cent) < nlist:
        nlist = len(cent)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for _ in range(iters):
        assigned = assign_clusters(df, vec_col, cent).select(
            "__cluster", F.posexplode(v).alias("__dim", "__x")
        )
        means = (
            assigned.groupBy("__cluster", "__dim")
            .agg(F.avg("__x").alias("m"))
            .collect()
        )
        new = cent.copy()
        for r in means:
            new[r["__cluster"], r["__dim"]] = r["m"]
        if np.allclose(new, cent, atol=1e-9):
            break
        cent = new
    return cent


def ann_pca_topk(
    df: DataFrame,
    query: Sequence[float],
    model,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rerank: int = 4,
) -> DataFrame:
    """ANN via PCA pre-reduction (operators/pca.py): score candidates in
    the k'-dim principal subspace (cheap fold over k' doubles instead of
    d), shortlist ``rerank * k`` by approximate score, exact-cosine
    rerank only the shortlist.

    Standard recall/cost trade for the read side of a 768-dim corpus:
    the full-dim fold runs on ``rerank*k`` rows instead of n.  The
    shortlist is a TakeOrdered (no global sort); the rerank filter is an
    ``isin`` over the collected candidate ids (bounded by rerank*k), so
    nothing corpus-sized moves.  Approximation comes only from the
    subspace ordering; shortlist quality tracks the explained-variance
    ratio at k'.  For ANN prefer a ``center=False`` model: an
    uncentered orthonormal basis preserves raw dot products (with
    k' = d exactly), while centering shifts scores by a per-vector
    ``x . mean`` term."""
    from .pca import pca_project

    q = np.asarray(query, dtype=np.float64)
    qp = (q - model.mean) @ model.components.T  # query in subspace
    kk = len(model.components)
    proj = pca_project(df, vec_col, model, out_cols=[f"__p{j}" for j in range(kk)])
    approx = sum(
        F.col(f"__p{j}") * F.lit(float(qp[j])) for j in range(kk)
    )
    shortlist = (
        proj.select(F.col(id_col), approx.alias("__a"))
        .orderBy(F.desc("__a"), F.col(id_col))
        .limit(int(rerank * k))
        .collect()
    )
    ids = [r[id_col] for r in shortlist]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        df.filter(F.col(id_col).isin(ids))
        .select(F.col(id_col), F.round(_cosine(v, query), 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def ann_recall_at_k(
    truth: DataFrame,
    variants: "dict[str, DataFrame]",
    id_col: str = "vec_id",
    k: int = 10,
    query_col: str | None = None,
) -> DataFrame:
    """Recall@k of each ANN variant against exact ground truth (VERDICT
    r10 missing #2 — the approximation-QUALITY measurement the
    hash-gated variant rows cannot give: each of those proves its
    pruning is implemented as specified, not that the pruning keeps the
    right neighbours).  ``truth`` is the exact top-k frame (e.g.
    :func:`cosine_topk`); each ``variants`` entry is one ANN method's
    top-k over the same query/corpus.  Returns one row per variant —
    (variant, k, truth_n, returned, hits, recall_pm): ``hits`` is the
    exact integer overlap |variant ∩ truth|, ``returned`` the variant's
    actual result size (a pruning that returns < k rows is visible, not
    hidden in a denominator), ``truth_n`` the truth frame's ACTUAL row
    count, and ``recall_pm`` = round(hits·1000/truth_n) — recall as an
    integer-tier rounded rational of exact integers.  The denominator
    is ``truth_n``, not the requested ``k`` (ADVICE r11 #2): when the
    corpus is smaller than k (or the truth top-k is short), a variant
    that returns every true neighbour scores 1000, not an
    under-reported hits/k — and the denominator it was scored against
    is a visible output column, never implicit.  An EMPTY truth frame
    yields recall_pm = 0 (guarded, no division) — recall against
    nothing is reported as zero, not an engine error.

    ``query_col`` is the BATCH-evaluation form (the shape a real recall
    benchmark takes — many probe queries, mean recall): truth and every
    variant carry one top-k PER query id, matches join on (query, id),
    and ``recall_pm`` = round(hits·1000 / truth_n) where ``truth_n`` is
    the truth frame's TOTAL row count across queries — the
    micro-averaged recall over the truth frame's query set, still a
    rational of exact integers (both n_queries and truth_n come from
    the truth frame itself, so a variant that skips a query entirely is
    penalized, not silently dropped from its own denominator, and a
    query whose true top-k is short contributes its actual size, not a
    padded k).

    Scale shape: the tagged variant top-k frames union into one
    ≤ |variants|·k·n_queries-row frame, the truth ids broadcast
    (k·n_queries rows), ONE left equi-join + ONE groupBy (plus a 1-row
    truth-count aggregate broadcast-crossed in) —
    nothing corpus-sized moves; the corpus cost is inside the
    variant/truth frames themselves, each of which is a TakeOrdered,
    not a global sort.  The per-variant frames are a bounded
    enumeration (one per ANN method), so the Python loop below is plan
    composition, not a driver-side data loop."""
    if not variants:
        raise ValueError("ann_recall_at_k needs >= 1 variant frame")
    key_cols = ["__tid"] if query_col is None else ["__q", "__tid"]
    t_sel = [F.col(id_col).alias("__tid"), F.lit(1).alias("__hit")]
    if query_col is not None:
        t_sel.insert(0, F.col(query_col).alias("__q"))
    t = truth.select(*t_sel)
    tagged = None
    for name, df in variants.items():
        cols = [F.lit(str(name)).alias("variant")]
        if query_col is not None:
            cols.append(F.col(query_col).alias("__q"))
        cols.append(F.col(id_col).alias("__tid"))
        part = df.select(*cols)
        tagged = part if tagged is None else tagged.unionByName(part)
    grouped = (
        tagged.join(F.broadcast(t), on=key_cols, how="left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("returned"),
            F.coalesce(F.sum("__hit"), F.lit(0))
            .cast("long")
            .alias("hits"),
        )
    )
    # ADVICE r11 #2: recall's denominator is the truth frame's ACTUAL
    # row count, never the requested k — and it ships as a column.  The
    # when-guard keeps an empty truth frame at recall 0 instead of an
    # ANSI-mode division error.
    recall = (
        F.when(
            F.col("__tn") > 0,
            F.round(
                F.col("hits") * 1000.0 / F.col("__tn").cast("double")
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("recall_pm")
    )
    if query_col is not None:
        nq = truth.agg(
            F.count_distinct(F.col(query_col)).alias("__nq"),
            F.count(F.lit(1)).alias("__tn"),
        )
        return grouped.crossJoin(F.broadcast(nq)).select(
            "variant",
            F.lit(int(k)).cast("int").alias("k"),
            F.col("__nq").cast("long").alias("n_queries"),
            F.col("__tn").cast("long").alias("truth_n"),
            "returned",
            "hits",
            recall,
        )
    tn = truth.agg(F.count(F.lit(1)).alias("__tn"))
    return grouped.crossJoin(F.broadcast(tn)).select(
        "variant",
        F.lit(int(k)).cast("int").alias("k"),
        F.col("__tn").cast("long").alias("truth_n"),
        "returned",
        "hits",
        recall,
    )
