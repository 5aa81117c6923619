"""Text preparation operators for LLM training-data pipelines:
PII scrubbing, quality filtering, deterministic stratified sampling and
context-window sequence packing.

All are pure Column expressions (JVM-side, whole-stage codegen) with SQL
twins for the DuckDB oracle.  Regex patterns are written in the common
subset of Java regex (Spark) and RE2 (DuckDB) — no backreferences, no
lookaround — so both engines transform text identically.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_int32, md5_int32_sql, ws_tokens
from .prefix import default_n_shards, global_row_number, global_running_sum

__all__ = [
    "scrub_pii",
    "scrub_pii_sql",
    "quality_filter",
    "deterministic_sample",
    "hash_split",
    "leakage_safe_split",
    "leakage_safe_folds",
    "normalize_text",
    "strip_html",
    "deterministic_shuffle",
    "strip_html_sql",
    "deterministic_sample_sql",
    "pack_sequences",
    "chunk_documents",
    "build_vocabulary",
    "encode_with_vocabulary",
    "stratified_sample",
    "temperature_sample",
]

# pattern, replacement — order matters (emails before bare domains, etc.)
_PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\+?\d[\d ()-]{7,}\d\b", "<PHONE>"),
    (r"https?://[^\s]+", "<URL>"),
]


def scrub_pii(col: Column) -> Column:
    """Redact emails, IPv4 addresses, phone-like digit runs and URLs with
    typed placeholders (the standard pre-training scrub pass)."""
    out = col
    for pat, repl in _PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii_sql(expr: str) -> str:
    """DuckDB twin — note DuckDB's regexp_replace needs the 'g' flag to
    replace ALL occurrences (Spark replaces all by default)."""
    out = expr
    for pat, repl in _PII_RULES:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


def quality_filter(
    df: DataFrame,
    text_col: str,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_mean_token_len: float = 15.0,
) -> DataFrame:
    """Heuristic quality gate: token-count window plus a mean-token-length
    cap (catches binary junk / no-whitespace blobs).  One narrow scan.

    The token count is lambda-bound (exists over a 1-element array) so
    the split() tokenization runs ONCE per row — Catalyst does not CSE
    the five sibling references the naive predicate would emit, and at
    corpus scale five redundant tokenizations of every document is the
    whole scan budget (measured 2.1x at sf1; BASELINE.md perf note 1)."""
    def pred(n: Column) -> Column:
        mean_len = (F.length(F.trim(F.col(text_col))) - (n - 1)) / n
        return (
            (n >= min_tokens)
            & (n <= max_tokens)
            & (mean_len <= max_mean_token_len)
        )

    return df.filter(
        F.exists(F.array(F.size(ws_tokens(F.col(text_col)))), pred)
    )


def deterministic_sample(
    df: DataFrame, id_col: str, keep_per_mille: int, salt: str = "sample"
) -> DataFrame:
    """Keep ~keep_per_mille/1000 of rows by md5 threshold — deterministic,
    engine-independent, and stratification-safe (apply after a groupBy
    key or per-language partition to downsample each stratum equally).
    Unlike rand(), re-running or re-partitioning never changes the
    sample."""
    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.filter(h % 1000 < keep_per_mille)


def deterministic_sample_sql(id_expr: str, keep_per_mille: int, salt: str = "sample") -> str:
    salted = f"'{salt}' || CAST({id_expr} AS VARCHAR)"
    return f"{md5_int32_sql(salted)} % 1000 < {keep_per_mille}"


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: "Sequence[tuple[str, int]]",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in one
    named split by md5 bucket (per-mille weights, must sum to 1000).
    Same guarantees as :func:`deterministic_sample` — engine-independent,
    stable under re-partitioning and re-runs, and a document keeps its
    split across pipeline versions (no train/test leakage when the
    corpus is rebuilt)."""
    if sum(w for _, w in splits) != 1000:
        raise ValueError("split weights must sum to 1000 (per-mille)")
    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 1000
    expr = None
    cum = 0
    for name, w in splits:
        cum += w
        cond = h < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    dup_pairs: DataFrame,
    splits: "Sequence[tuple[str, int]]",
    salt: str = "split",
    out_col: str = "split",
    rep_col: str | None = None,
) -> DataFrame:
    """:func:`hash_split` that cannot leak near-duplicates across the
    train/eval boundary: documents connected by ``dup_pairs``
    (``id_a``/``id_b`` rows from any dedup family — exact-digest star
    edges, MinHash/SimHash verified pairs, embedding near-dups) are
    assigned as a UNIT, keyed on their connected component's minimum
    id, so an eval split can never contain a near-copy of a training
    document.  A plain per-document hash split splits a duplicate pair
    train/test with probability 2·p·(1−p) per pair — the classic
    benchmark-inflation bug this operator removes.

    Documents in no pair hash exactly as :func:`hash_split` does on
    their own id (their component is themselves), so enabling
    leakage-safety only moves the connected minority.

    ``rep_col`` (optional) also emits the component representative for
    audit joins.

    Scale shape: components via
    :func:`..operators.graph.connected_components` (min-label
    propagation; rounds = dup-graph diameter — near-dup graphs are
    dense cliques/stars, so 1-2 rounds; pass ALTERNATING-star output
    instead for pathological chains) + ONE left join of the corpus
    against the node→component frame (dup-graph-node-sized, usually a
    small fraction of the corpus — AQE broadcasts it) + the md5 CASE.
    Feed STAR edges (group-min → member) rather than clique edges for
    exact-dup groups: linear, same components."""
    from .graph import connected_components

    comp = connected_components(dup_pairs, "id_a", "id_b").select(
        F.col("node").alias("__lsnode"),
        F.col("component").alias("__lscomp"),
    )
    joined = df.join(
        comp, df[id_col] == comp["__lsnode"], "left"
    ).drop("__lsnode")
    rep = F.coalesce(F.col("__lscomp"), F.col(id_col))
    h = md5_int32(F.concat(F.lit(salt), rep.cast("string"))) % 1000
    expr = None
    cum = 0
    if sum(w for _, w in splits) != 1000:
        raise ValueError("split weights must sum to 1000 (per-mille)")
    for name, w in splits:
        cum += w
        cond = h < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    out = joined.withColumn(out_col, expr)
    if rep_col is not None:
        out = out.withColumn(rep_col, rep)
    return out.drop("__lscomp")


def hash_split_sql(
    id_expr: str, splits: "Sequence[tuple[str, int]]", salt: str = "split"
) -> str:
    """DuckDB CASE twin of :func:`hash_split`."""
    salted = f"'{salt}' || CAST({id_expr} AS VARCHAR)"
    h = f"({md5_int32_sql(salted)} % 1000)"
    cases, cum = [], 0
    for name, w in splits:
        cum += w
        cases.append(f"WHEN {h} < {cum} THEN '{name}'")
    return "CASE " + " ".join(cases) + " END"


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token windows (the standard
    long-document → context-window preprocessing): chunk i covers tokens
    [i·step, i·step + chunk_tokens) with step = chunk_tokens − overlap.
    Pure Column expressions (sequence + slice + posexplode) — one narrow
    scan, rows out = Σ ceil(n_tokens/step).

    The token array is lambda-bound (transform over a 1-element array)
    so the split() runs ONCE per document; the naive formulation
    re-evaluated the tokenization inside every chunk's slice() — k
    splits for a k-chunk document (same no-CSE trap as quality_filter;
    measured 1.5x at sf1)."""
    assert 0 <= overlap < chunk_tokens
    step = chunk_tokens - overlap

    def per_doc(t: Column) -> Column:
        starts = F.sequence(
            F.lit(0), F.greatest(F.size(t) - 1, F.lit(0)), F.lit(step)
        )
        return F.transform(
            starts,
            lambda s: F.struct(
                F.concat_ws(" ", F.slice(t, s + 1, chunk_tokens)).alias(
                    "chunk_text"
                ),
                F.greatest(F.least(F.lit(chunk_tokens), F.size(t) - s), F.lit(0))
                .cast("int")
                .alias("chunk_tokens"),
            ),
        )

    chunks = F.get(
        F.transform(F.array(ws_tokens(F.col(text_col))), per_doc), 0
    )
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__c")
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.chunk_tokens").alias("chunk_tokens"),
    )


def build_vocabulary(
    df: DataFrame, text_col: str, min_count: int = 1, top_k: int | None = None
) -> DataFrame:
    """Corpus vocabulary by global token frequency (tokenizer-training
    prep): (token, count, token_id) with ids assigned by count desc then
    token asc — fully deterministic.  One explode + one groupBy.

    With ``top_k`` the ranking window touches only the k survivors of a
    distributed TakeOrdered.  WITHOUT ``top_k`` the rank runs through
    the shard-offset prefix pattern (operators/prefix.py) over
    (-count, token) — no single-partition window even when the full
    vocabulary is ranked (the count=1 tie class still lands in one
    shard; bounded by that class, not the corpus)."""
    counts = (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    if top_k:
        # distributed top-k first (TakeOrderedAndProject — per-partition
        # heaps, no global sort), THEN rank the k survivors; the ranking
        # window touches top_k rows, not the whole vocabulary
        counts = counts.orderBy(F.desc("count"), F.col("token")).limit(top_k)
        # partition on a constant-valued expression the optimizer cannot
        # fold away (pmod(col, 1) ≡ 0): one group — required for a global
        # rank — without WindowExec's misleading no-partition warning;
        # the input here is bounded by top_k rows
        w = Window.partitionBy(F.pmod(F.col("count"), F.lit(1))).orderBy(
            F.desc("count"), F.col("token")
        )
        return counts.withColumn("token_id", F.row_number().over(w).cast("long"))
    ranked = global_row_number(
        counts.withColumn("__negc", (-F.col("count")).cast("double")),
        "__negc",
        default_n_shards(counts),
        out_col="token_id",
        tiebreak_cols=["token"],
    )
    return ranked.drop("__negc").select("token", "count", "token_id")


def encode_with_vocabulary(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: DataFrame,
    oov_id: int = -1,
) -> DataFrame:
    """Encode each document as a token-id array under ``vocab``
    (a (token, token_id) frame, e.g. :func:`build_vocabulary` output) —
    the tokenizer-apply step after vocabulary training.

    posexplode → broadcast vocab join (vocabulary-sized build side) →
    one shuffle on the doc id re-assembling ids in position order
    (sorted struct collect, bounded by document length).  Unknown
    tokens become ``oov_id`` and are counted in ``n_oov``; token-less
    documents keep an empty array."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(ws_tokens(F.col(text_col))).alias("__pos", "token"),
    )
    enc = toks.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    agg = enc.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "token_id"))),
            lambda s: F.coalesce(s["token_id"], F.lit(oov_id)).cast("long"),
        ).alias("token_ids"),
        F.sum(F.col("token_id").isNull().cast("long")).alias("n_oov"),
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("token_ids", F.array().cast("array<long>")).alias("token_ids"),
        F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
    )


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, k: int, salt: str = "strat"
) -> DataFrame:
    """Exactly ≤k rows per stratum, chosen by deterministic md5 order —
    balanced downsampling across languages/domains without rand()'s
    repartitioning instability.  One shuffle on the stratum key."""
    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target_frac: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-weighted domain mixing (the multinomial-sampling
    scheme of XLM-R / mT5, temperature fixed at α = 0.5): stratum ``s``
    with ``n_s`` rows is sampled with probability ``q_s ∝ √n_s``, so
    small domains are up-weighted relative to their natural share and
    head domains are damped.  Expected output size ≈ ``target_frac·N``
    rows; a stratum whose quota exceeds its population is kept whole
    (rate capped at 1, so the realized total can undershoot when many
    strata saturate).

    Row selection is the deterministic md5 threshold of
    :func:`deterministic_sample` — re-running, re-partitioning, or a
    different engine yields the identical sample.  α is fixed at 0.5
    because ``sqrt`` is IEEE-exact in every engine, keeping the
    per-stratum thresholds bit-reproducible across Spark and the DuckDB
    oracle; an arbitrary-α variant would ride on ``pow``, whose last-ULP
    rounding is libm-dependent.

    Scale shape: ONE map-side-combined count shuffle over ``|strata|``
    keys, a scalar aggregate over the tiny counts relation, and a
    broadcast rates join back onto the corpus — the corpus itself is
    scanned once and never shuffled.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__cnt"))
    # sums derives from counts, so the cross join below is a self-join:
    # qualify both sides to keep attribute resolution unambiguous
    sums = counts.agg(
        F.sum("__cnt").alias("__tot"),
        # cross-stratum float sum: round to 6 so the Spark/DuckDB
        # accumulation orders cannot disagree in the last ULP
        F.round(F.sum(F.sqrt(F.col("__cnt").cast("double"))), 6).alias("__den"),
    ).alias("s")
    rate = (
        F.lit(target_frac)
        * F.col("s.__tot")
        * F.sqrt(F.col("c.__cnt").cast("double"))
        / F.col("s.__den")
        / F.col("c.__cnt")
    )
    rates = counts.alias("c").crossJoin(F.broadcast(sums)).select(
        F.col("c." + strata_col),
        F.floor(F.round(F.least(F.lit(1.0), rate) * 1_000_000, 3)).alias("__thresh"),
    )
    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(h % 1_000_000 < F.col("__thresh"))
        .drop("__thresh")
    )


def temperature_sample_sql(
    rel: str, strata_col: str, id_expr: str,
    target_frac: float = 0.5, salt: str = "mix",
) -> str:
    """DuckDB twin of :func:`temperature_sample` (expression order kept
    identical so every double matches bit for bit)."""
    salted = f"'{salt}' || CAST({id_expr} AS VARCHAR)"
    return f"""
    WITH __counts AS (
      SELECT {strata_col}, COUNT(*) AS __cnt FROM {rel} GROUP BY {strata_col}
    ), __sums AS (
      SELECT SUM(__cnt) AS __tot,
             ROUND(SUM(sqrt(CAST(__cnt AS DOUBLE))), 6) AS __den
      FROM __counts
    ), __rates AS (
      SELECT {strata_col},
             CAST(floor(ROUND(LEAST(CAST(1.0 AS DOUBLE),
               {target_frac} * __tot * sqrt(CAST(__cnt AS DOUBLE)) / __den / __cnt
             ) * 1000000, 3)) AS BIGINT) AS __thresh
      FROM __counts, __sums
    )
    SELECT t.* FROM {rel} t JOIN __rates r USING ({strata_col})
    WHERE {md5_int32_sql(salted)} % 1000000 < r.__thresh
    """


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str,
    target_tokens: int,
    partition_cols: list[str] | None = None,
    bounds_src: DataFrame | None = None,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Assign documents to context-window bins: deterministic id order,
    exclusive running token total, bin = floor(running / target) — the
    prefix-sum approximation of greedy packing (a bin may overflow by at
    most one document, which downstream truncation handles; exact greedy
    packing is inherently sequential).

    With ``partition_cols`` the cumulative sum runs per partition key
    (pack within shards, e.g. by date or hash prefix).  WITHOUT keys the
    global order is computed with the shard-offset prefix sum
    (operators/prefix.py): order-preserving range shards → one shuffle
    whose window computes both the within-shard ROWS prefix and the
    shard totals → broadcast offsets join.  Bit-identical to a global
    sort-order window, but the heavy pass keeps full shuffle parallelism
    instead of moving the corpus through one task.  Numeric ``id_col``
    required for the global path (range boundaries come from a quantile
    sketch); non-numeric ids should pack within ``partition_cols``.

    The boundary sketch is one extra job over ``bounds_src`` (default:
    ``df``).  When ``token_col`` is expensive to derive (tokenization),
    pass the pruned upstream id column so the sketch skips it (see
    pack_documents_bins).
    """
    keys = partition_cols or []
    if not keys:
        packed = global_running_sum(
            df, id_col, token_col, default_n_shards(df),
            exclusive=True, bounds_src=bounds_src, bounds=bounds,
        )
        return packed.withColumn(
            "bin", F.floor(F.col("__running") / F.lit(target_tokens)).cast("long")
        ).drop("__running")
    # explicit ROWS frame: the default RANGE frame sums ALL peer rows on
    # order-key ties, collapsing the prefix sum — id_col should still be
    # unique for a deterministic packing
    w = (
        Window.partitionBy(*keys)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return df.withColumn(
        "bin", F.floor(running / F.lit(target_tokens)).cast("long")
    )


def normalize_text(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    form: str = "NFC",
    collapse_ws: bool = True,
    strip_control: bool = True,
) -> DataFrame:
    """Unicode-normalize a text column (NFC/NFKC/...), optionally strip
    control characters and collapse whitespace runs — the canonical
    first stage of a multi-source ingest (mixed encodings produce
    visually-identical strings with different code points, which breaks
    exact dedup and vocabulary counting downstream).

    Unicode normalization has no JVM builtin, so it is an Arrow-batched
    pandas UDF (`unicodedata.normalize`); the whitespace/control steps
    stay JVM-side regexp_replace.  DuckDB's ``nfc_normalize`` is the
    cross-engine oracle for the NFC form."""
    out = out_col or text_col

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    c = norm(F.col(text_col))
    if strip_control:
        c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out, c)


_HTML_BLOCK_RES = [
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?is)<!--.*?-->",
]
_HTML_ENTITIES = [  # order matters: '&amp;' LAST so '&amp;lt;' single-unescapes
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(col: Column) -> Column:
    """HTML → text (the extraction stage of a web-crawl ingest):
    drop script/style/comment blocks, replace every remaining tag with a
    space, unescape the common entities, collapse whitespace.

    Deliberately regex-subset-compatible across engines: no
    backreferences, non-greedy quantifiers only (Java regex and
    DuckDB's RE2 agree on both), so the DuckDB twin is the same
    pattern chain verbatim."""
    c = F.coalesce(col, F.lit(""))
    for pat in _HTML_BLOCK_RES:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_html_sql(expr: str) -> str:
    """DuckDB twin of :func:`strip_html` (same chain, same order)."""
    c = f"COALESCE({expr}, '')"
    for pat in _HTML_BLOCK_RES:
        c = f"regexp_replace({c}, '{pat}', ' ', 'g')"
    c = f"regexp_replace({c}, '<[^>]+>', ' ', 'g')"
    for ent, rep in _HTML_ENTITIES:
        rep_sql = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{rep_sql}')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle",
    out_col: str = "shuffle_rank",
) -> DataFrame:
    """A reproducible global pseudo-random ordering: rank by
    md5(salt || id) via the shard-offset global row number (no
    single-partition window).  The standard pre-packing step — training
    order must be shuffled but REPRODUCIBLE across reruns and
    repartitioning, which ``orderBy(rand())`` is not."""
    h = md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    with_key = df.withColumn("__shuf", h)
    return global_row_number(
        with_key,
        "__shuf",
        default_n_shards(df.sparkSession),
        out_col=out_col,
        tiebreak_cols=[id_col],
    ).drop("__shuf")


def leakage_safe_folds(
    df: DataFrame,
    id_col: str,
    dup_pairs: DataFrame,
    k: int,
    salt: str = "fold",
    out_col: str = "fold",
    rep_col: str | None = None,
) -> DataFrame:
    """K-fold assignment that cannot leak near-duplicates across fold
    boundaries — the cross-validation face of
    :func:`leakage_safe_split`: documents connected by ``dup_pairs``
    land in the SAME fold (keyed on their connected component's
    minimum id), so no validation fold ever holds a near-copy of
    another fold's training document.  ``fold ∈ [0, k)`` =
    ``md5(salt|rep) % k`` — deterministic per salt, uniform in
    expectation per component (folds balance in components, not
    documents: a giant near-dup cluster weighs one unit, which is the
    point).

    Scale shape: identical to leakage_safe_split — components over
    the dup pairs (dup-graph-sized), ONE broadcast left join, one
    hash projection; the corpus never shuffles."""
    if k < 2:
        raise ValueError("k must be >= 2")
    from .graph import connected_components

    comp = connected_components(dup_pairs, "id_a", "id_b").select(
        F.col("node").alias("__lfnode"),
        F.col("component").alias("__lfcomp"),
    )
    joined = df.join(
        comp, df[id_col] == comp["__lfnode"], "left"
    ).drop("__lfnode")
    rep = F.coalesce(F.col("__lfcomp"), F.col(id_col))
    fold = (
        md5_int32(F.concat(F.lit(salt), rep.cast("string"))) % k
    ).cast("int")
    out = joined.withColumn(out_col, fold)
    if rep_col is not None:
        out = out.withColumn(rep_col, rep)
    return out.drop("__lfcomp")
