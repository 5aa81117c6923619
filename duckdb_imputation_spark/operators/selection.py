"""Data selection for training corpora — importance weighting and
perplexity partitioning.

Two standard levers for choosing WHAT to train on once dedup and
quality filters have done their work:

* **DSIR-style importance weights** (Xie et al., "Data Selection for
  Language Models via Importance Resampling", NeurIPS 2023): score each
  document by how much more likely its tokens are under a TARGET
  distribution (a trusted high-quality subset) than under the SOURCE
  distribution (the whole corpus), using smoothed unigram language
  models.  Documents with high weight "look like" the target domain;
  resampling by weight shifts the training mixture toward it without
  hand-written rules.

* **CCNet-style perplexity buckets** (Wenzek et al., "CCNet: Extracting
  High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
  rank the corpus by language-model score and split it into
  equal-sized head / middle / tail thirds.  CCNet trains on head (and
  sometimes middle); tail is the junk drawer.  Rank-based terciles (not
  score thresholds) make the split exact, deterministic, and free of
  floating-point threshold edge cases.

Scale shape: the unigram models are vocabulary-sized count tables that
broadcast to a token-level join (the same plan as the green
``unigram_logprob_scores`` catalog row); the per-document aggregate is
one shuffle on doc id.  The global rank rides
:func:`..operators.prefix.global_row_number` — the shard-offset pattern,
never a single-partition window.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_int32, ws_tokens
from .prefix import global_row_number

__all__ = [
    "importance_weights",
    "perplexity_buckets",
    "domain_divergence",
    "weighted_sample",
    "weighted_sample_grouped",
    "psi_drift",
    "psi_vs_reference",
    "source_overlap",
]


def _doc_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hash_buckets: int | None = None,
) -> DataFrame:
    t = df.select(
        id_col, F.explode(ws_tokens(F.col(text_col))).alias("token")
    )
    if hash_buckets is not None:
        # hashed-feature mode (the DSIR paper's own construction):
        # tokens collapse to md5 % N buckets, so every downstream count
        # table is bounded at N rows no matter the corpus vocabulary
        t = t.withColumn(
            "token",
            F.pmod(
                md5_int32(F.col("token"), seed="selbkt|"),
                F.lit(hash_buckets),
            ).cast("string"),
        )
    return t


def importance_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int | None = 6,
    hash_buckets: int | None = None,
) -> DataFrame:
    """Per-document DSIR importance weight: mean over the document's
    tokens of ``ln(p_target(tok) / p_source(tok))`` under add-one
    smoothed unigram models, where the target model is estimated from
    the rows matching the ``target`` predicate and the source model
    from the full ``df``.

    Returns (id_col, imp_weight, n_tokens) for every document with at
    least one token.  Positive = looks more like the target than the
    average document; ``exp(imp_weight * n_tokens)`` recovers the raw
    likelihood ratio if resampling needs it.

    Smoothing shares ONE vocabulary (the source's, which contains the
    target's): ``p(tok|model) = (c_model(tok)+1) / (N_model + V)``, so
    target-unseen tokens pull the weight down rather than zeroing it.
    The log is taken of a single ratio of products — the exact
    expression shape the DuckDB oracle replays bit-for-bit.

    Memory bound: exact mode's model is VOCABULARY-sized — over a web
    crawl, distinct tokens (URLs, typos, code) run to billions, which
    no executor can hold.  Two defenses:

    * ``hash_buckets=N`` collapses tokens to ``md5 % N`` hashed
      features (the DSIR paper's own construction), bounding every
      count table — and the broadcast — at N rows for ANY corpus;
      weights shift slightly from bucket collisions but the estimator
      is the published one.
    * exact mode carries NO explicit broadcast hint on the model join:
      Spark (AQE) broadcasts while the model is small and falls back
      to a shuffle join past the threshold instead of OOM-ing."""
    toks = _doc_tokens(df, id_col, text_col, hash_buckets)
    tgt_toks = _doc_tokens(df.where(target), id_col, text_col, hash_buckets)

    src_cnt = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("c_src")
    )
    tgt_cnt = tgt_toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("c_tgt")
    )
    vocab = src_cnt.join(tgt_cnt, "token", "left").select(
        "token", "c_src", F.coalesce("c_tgt", F.lit(0.0)).alias("c_tgt")
    )
    # scalar totals: N_src, N_tgt, V — one row, broadcast to every token
    totals = vocab.agg(
        F.sum("c_src").alias("n_src"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    model = vocab.crossJoin(F.broadcast(totals))
    if hash_buckets is not None:
        model = F.broadcast(model)  # provably <= hash_buckets rows
    scored = toks.join(model, "token").select(
        id_col,
        F.log(
            ((F.col("c_tgt") + 1.0) * (F.col("n_src") + F.col("v")))
            / ((F.col("c_src") + 1.0) * (F.col("n_tgt") + F.col("v")))
        ).alias("__lr"),
    )
    w = F.sum("__lr") / F.count(F.lit(1))
    if round_digits is not None:
        w = F.round(w, round_digits)
    return scored.groupBy(id_col).agg(
        w.alias("imp_weight"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def perplexity_buckets(
    scores: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_shards: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """Split a scored corpus into equal-sized ``head`` / ``middle`` /
    ``tail`` thirds by descending model score (head = most fluent, the
    CCNet split).  Rank-based, so the cut is exact integer arithmetic:
    rank r of n lands in head iff ``3r <= n``, middle iff ``3r <= 2n``.
    Ties on the score break by ``id_col`` for full determinism.

    Adds ``ppl_rank`` (1-based global rank) and ``ppl_bucket`` to the
    input.  The global rank uses the shard-offset pattern
    (:func:`..operators.prefix.global_row_number`) — one range exchange
    plus a broadcast of ``n_shards`` offsets, never a single-partition
    window; n arrives via a 1-row scalar-aggregate broadcast.

    ``checkpoint=True`` (default) materializes ``scores`` once with
    ``localCheckpoint`` before ranking: the ranking machinery reads the
    scored frame from FOUR branches (shard-bounds job, per-shard
    window, shard-totals offsets, the global count), and scores are
    usually the output of an expensive corpus scan (a token-level LM
    join) that must not run four times.  The scored frame itself is
    doc-level — corpus row count, not token count — so the
    materialization is the cheap side of that trade at any scale."""
    if checkpoint:
        scores = scores.localCheckpoint(eager=False)
    neg = scores.withColumn("__neg", -F.col(score_col))
    ranked = global_row_number(
        neg, "__neg", n_shards, out_col="ppl_rank", tiebreak_cols=[id_col]
    ).drop("__neg")
    n = scores.agg(F.count(F.lit(1)).alias("__n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        *scores.columns,
        "ppl_rank",
        F.when(F.col("ppl_rank") * 3 <= F.col("__n"), F.lit("head"))
        .when(F.col("ppl_rank") * 3 <= F.col("__n") * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


def domain_divergence(
    df: DataFrame,
    domain_col: str,
    text_col: str = "text",
    round_digits: int | None = 6,
    hash_buckets: int | None = None,
) -> DataFrame:
    """Per-domain KL divergence KL(P_domain || P_corpus) between MLE
    unigram distributions — the mixture-monitoring signal: which
    sources drift away from the corpus average (new crawl snapshot
    looks different, a source went spammy, a scraper broke).

    No smoothing is needed: the sum runs over the domain's OWN observed
    tokens (p(t) = 0 terms vanish), and every such token has corpus
    probability q(t) > 0 because the corpus contains the domain.
    Returns (domain_col, kl_divergence, n_tokens); KL >= 0, and 0 only
    for a domain distributed exactly like the corpus.

    Scale shape: one token-level count per (domain, token) — map-side
    combined — joined against the corpus vocabulary; the final
    aggregate is one shuffle on the domain key.  Memory bound: same as
    :func:`importance_weights` — ``hash_buckets=N`` caps the corpus
    model (and the per-domain tables) at N rows via ``md5 % N`` hashed
    features; exact mode leaves the corpus-model join unhinted so AQE
    degrades to a shuffle join instead of OOM-ing past the broadcast
    threshold (bucketed KL is the KL between the bucket-coarsened
    distributions — still >= 0, still 0 iff identical on buckets)."""
    toks = _doc_tokens(df, domain_col, text_col, hash_buckets)
    dom = toks.groupBy(domain_col, "token").agg(
        F.count(F.lit(1)).cast("double").alias("c_d")
    )
    corp = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    if hash_buckets is not None:
        corp = F.broadcast(corp)  # provably <= hash_buckets rows
    n_dom = dom.groupBy(domain_col).agg(F.sum("c_d").alias("n_d"))
    n_all = corp.agg(F.sum("c").alias("n"))
    j = (
        dom.join(corp, "token")
        .join(F.broadcast(n_dom), domain_col)
        .crossJoin(F.broadcast(n_all))
    )
    p = F.col("c_d") / F.col("n_d")
    q = F.col("c") / F.col("n")
    kl = F.sum(p * F.log(p / q))
    if round_digits is not None:
        kl = F.round(kl, round_digits)
    return j.groupBy(domain_col).agg(
        kl.alias("kl_divergence"),
        F.sum("c_d").cast("long").alias("n_tokens"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows with inclusion
    probability proportional to ``weight_col`` — the resampling half of
    DSIR.  Pair with :func:`importance_weights` via the RAW likelihood
    ratio ``w = exp(imp_weight * n_tokens)`` (the per-token mean alone
    compresses weights toward 1 and the draw degenerates to uniform);
    any positive weight column works.

    Efraimidis–Spirakis A-ES: draw u ~ Uniform(0,1] per row, keep the k
    largest ``u^(1/w)`` — provably equivalent to sequential weighted
    draws without replacement.  u comes from the repo's md5 primitive
    keyed on (salt, id), so the sample is deterministic per salt and
    reproducible across partitionings; vary ``salt`` for an independent
    draw.  Rows with weight <= 0 or NULL are excluded.  TakeOrdered
    moves k rows per partition — never the corpus."""
    from .hashing import md5_int60

    u = (md5_int60(F.col(id_col).cast("string"), seed=f"ws{salt}|") + 1.0) / float(
        2**60
    )
    key = F.pow(u, 1.0 / F.col(weight_col))
    keyed = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__ws_key", key)
    return keyed.orderBy(F.desc("__ws_key"), id_col).limit(k).drop("__ws_key")


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    bin_edges: list[float],
    by_cols: list[str] | tuple = (),
    round_digits: int | None = 6,
) -> DataFrame:
    """Population Stability Index between the ``group_a`` and
    ``group_b`` cohorts of ``value_col`` over FIXED ``bin_edges``, one
    PSI per ``by_cols`` stratum — the industry drift screen (rule of
    thumb: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major shift).

        PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

    with add-one (Laplace) smoothed proportions
    ``p_i = (c_i + 1)/(n_a + B)`` over ``B = len(edges) + 1`` buckets —
    smoothing keeps empty bins finite AND makes PSI exactly 0 for
    identical cohorts.  Bucket assignment is ``Σ (v ≥ edge)`` — pure
    integer comparisons, zero float boundary cross-engine; fixed
    edges (not quantiles) keep the metric comparable across runs,
    which is the point of PSI.  NULL when either cohort is empty.

    Scale shape: ONE conditional GROUP BY (stratum, bucket) — output
    ≤ |strata|·B cells; stratum totals are a |strata|-row broadcast
    join back.  Buckets unobserved in BOTH cohorts are never
    materialized — their identical smoothed term
    ``(p₀ − q₀)·ln(p₀/q₀)`` folds in algebraically as
    ``(B − k_obs) ×`` that constant (the chi-squared closure trick),
    so the bucket grid never needs generating.  The per-cell ln sum
    is the one transcendental surface (stat-class ROUND)."""
    keys = list(by_cols)
    bb = float(len(bin_edges) + 1)
    v = F.col(value_col).cast("double")
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    bucket = F.lit(0)
    for e in bin_edges:
        bucket = bucket + (v >= F.lit(float(e))).cast("int")
    d = (
        df.where((in_a | in_b) & v.isNotNull())
        .groupBy(*keys, bucket.alias("__bucket"))
        .agg(
            F.sum(F.when(in_a, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(in_b, 1).otherwise(0)).alias("__cb"),
        )
    )
    totals = d.groupBy(*keys).agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    j = (
        d.join(F.broadcast(totals), keys)
        if keys
        else d.crossJoin(F.broadcast(totals))
    )
    pa = (F.col("__ca") + 1.0) / (F.col("__na") + F.lit(bb))
    qb = (F.col("__cb") + 1.0) / (F.col("__nb") + F.lit(bb))
    term = (pa - qb) * F.log(pa / qb)
    # the shared term of every bucket unobserved in BOTH cohorts
    p0 = 1.0 / (F.col("__na") + F.lit(bb))
    q0 = 1.0 / (F.col("__nb") + F.lit(bb))
    zero_term = (p0 - q0) * F.log(p0 / q0)
    agg = j.groupBy(*keys).agg(
        F.first("__na").cast("long").alias("n_a"),
        F.first("__nb").cast("long").alias("n_b"),
        F.count(F.lit(1)).alias("__kobs"),
        F.sum(term).alias("__psi_obs"),
        F.first(zero_term).alias("__zt"),
    )
    psi = F.when(
        (F.col("n_a") >= 1) & (F.col("n_b") >= 1),
        F.col("__psi_obs")
        + (F.lit(bb) - F.col("__kobs")) * F.col("__zt"),
    )
    if round_digits is not None:
        psi = F.round(psi, round_digits)
    return agg.select(*keys, "n_a", "n_b", psi.alias("psi"))


def weighted_sample_grouped(
    df: DataFrame,
    weight_col: str,
    k: int,
    by_cols: list[str] | tuple,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-group :func:`weighted_sample`: ``k`` rows WITHIN each
    ``by_cols`` group with inclusion probability ∝ ``weight_col`` —
    the stratified resampling primitive (cap each source domain at k
    documents, quality-weighted, in one pass).

    Same Efraimidis–Spirakis key as the global variant — u from the
    md5 primitive on (salt, id), keep the k largest ``u^(1/w)`` per
    group — so a group's draw here equals
    ``weighted_sample(df.where(<group>), ...)`` EXACTLY (the key
    depends only on the row, not the group): stratification costs
    nothing and draws stay reproducible per salt.  Rows with NULL or
    non-positive weight are excluded.

    Scale shape: ONE window ranked per group (``partitionBy(by_cols)``
    — never a global window; a task holds one group's rows, the
    grouped-bottom-k bound); output is |groups| × k rows.  For the
    global draw use :func:`weighted_sample` (TakeOrdered, no window
    at all)."""
    from pyspark.sql import Window

    from .hashing import md5_int60

    by = list(by_cols)
    if not by:
        raise ValueError("by_cols must be non-empty; use weighted_sample")
    u = (
        md5_int60(F.col(id_col).cast("string"), seed=f"ws{salt}|") + 1.0
    ) / float(2**60)
    keyed = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__ws_key", F.pow(u, 1.0 / F.col(weight_col)))
    w = Window.partitionBy(*by).orderBy(F.desc("__ws_key"), id_col)
    return (
        keyed.withColumn("__ws_rn", F.row_number().over(w))
        .where(F.col("__ws_rn") <= k)
        .drop("__ws_key", "__ws_rn")
    )


def source_overlap(
    df: DataFrame,
    domain_col: str,
    text_col: str = "text",
    round_digits: int | None = 6,
) -> DataFrame:
    """Pairwise VOCABULARY Jaccard between every two domains — the
    mixture-composition diagnostic that complements
    :func:`domain_divergence` (KL says how far a source drifts from
    the corpus average; this says which sources duplicate each
    other's vocabulary — merge candidates, mislabeled crawls, split
    shards).

    Returns (domain_a, domain_b, n_shared, n_a, n_b, jaccard) for
    every UNORDERED co-occurring pair (domain_a < domain_b);
    ``jaccard = |V_a ∩ V_b| / (|V_a| + |V_b| − |V_a ∩ V_b|)`` over
    distinct token vocabularies.  Counts exact integers; the one
    division of exact integers is bit-identical cross-engine
    (rounding is display only).

    Scale shape: ONE corpus GROUP BY collapses rows to the distinct
    (domain, token) vocabulary; the token-keyed self-join is the
    inverted index — a token contributes at most |domains|² pairs
    regardless of its corpus frequency (the hot-token bound is the
    DOMAIN count, not the token count), and the pair aggregate output
    is ≤ |domains|²/2 rows.  Vocabulary sizes join back broadcast.
    Never a domain×domain×corpus product."""
    v = (
        df.select(
            F.col(domain_col).alias("__dom"),
            F.explode(ws_tokens(F.col(text_col))).alias("__t"),
        )
        .where(F.col("__dom").isNotNull())
        .distinct()
    )
    sizes = v.groupBy("__dom").agg(F.count(F.lit(1)).alias("__n"))
    a = v.select(F.col("__dom").alias("domain_a"), "__t")
    b = v.select(F.col("__dom").alias("domain_b"), "__t")
    inter = (
        a.join(b, "__t")
        .where(F.col("domain_a") < F.col("domain_b"))
        .groupBy("domain_a", "domain_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("__dom", "domain_a")),
            "domain_a",
        )
        .withColumnRenamed("__n", "n_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("__dom", "domain_b")),
            "domain_b",
        )
        .withColumnRenamed("__n", "n_b")
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    ).cast("double")
    if round_digits is not None:
        jac = F.round(jac, round_digits)
    return out.select(
        "domain_a",
        "domain_b",
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        jac.alias("jaccard"),
    )


def psi_vs_reference(
    counts: DataFrame,
    bucket_col: str,
    count_col: str,
    ref_counts: list[int],
    by_cols: list[str] | tuple = (),
    round_digits: int | None = 6,
) -> DataFrame:
    """PSI of observed BUCKET COUNTS against a constant reference
    histogram, one PSI per ``by_cols`` group — the scoring half of
    the streaming PSI monitor (each group is typically one event-time
    window; the reference is the frozen training / launch-week
    histogram).

        PSI = Σ_b (p_b − q_b)·ln(p_b/q_b),
        p_b = (c_b + 1)/(n + B),   q_b = (r_b + 1)/(n_ref + B)

    add-one smoothed on BOTH sides (empty bins finite; identical
    distributions → exactly 0).  Buckets absent from a group count as
    zero — unlike :func:`psi_drift`'s constant-term closure, the
    reference term q_b varies per bucket here, so the closure is an
    explicit grid: |groups| × B rows, built from the B-row reference
    frame (B = len(ref_counts); a handful) — still nothing
    group-sized anywhere.  NULL when a group has no observations.

    Scale shape: one aggregate for the group totals, one tiny grid
    cross join (groups × B), one left join of the observed cells, one
    keyed fold.  All frames are |groups|·B except the input counts
    themselves."""
    keys = list(by_cols)
    bb = len(ref_counts)
    n_ref = float(sum(ref_counts))
    ref = F.array(*[F.lit(float(r)) for r in ref_counts])
    groups = counts.groupBy(*keys).agg(
        F.sum(F.col(count_col)).cast("double").alias("__n")
    )
    grid = groups.select(
        *keys,
        "__n",
        F.posexplode(ref).alias("__b", "__r"),
    )
    # keys renamed on the observed side: grid and obs share the input
    # frame's lineage, and a name-based self-join on a memory-sink view
    # trips Catalyst's conflicting-attribute check
    obs = counts.select(
        *[F.col(k).alias(f"__ok_{i}") for i, k in enumerate(keys)],
        F.col(bucket_col).cast("int").alias("__ob"),
        F.col(count_col).cast("double").alias("__c"),
    )
    cond = [F.col("__b") == F.col("__ob")]
    for i, k in enumerate(keys):
        cond.append(F.col(k) == F.col(f"__ok_{i}"))
    j = (
        grid.join(obs, reduce(lambda a, b: a & b, cond), "left")
        .drop("__ob", *[f"__ok_{i}" for i in range(len(keys))])
        .fillna({"__c": 0.0})
    )
    p = (F.col("__c") + 1.0) / (F.col("__n") + F.lit(float(bb)))
    q = (F.col("__r") + 1.0) / (F.lit(n_ref) + F.lit(float(bb)))
    term = (p - q) * F.log(p / q)
    agg = j.groupBy(*keys).agg(
        F.first("__n").cast("long").alias("n"),
        F.sum(term).alias("__psi"),
    )
    psi = F.when(F.col("n") >= 1, F.col("__psi"))
    if round_digits is not None:
        psi = F.round(psi, round_digits)
    return agg.select(*keys, "n", psi.alias("psi"))
