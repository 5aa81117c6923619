"""Full-text retrieval: BM25 scoring over a document corpus.

The classic training-data / RAG building block: score documents against
a bag-of-words query with BM25 and return the top-k.  Everything is
declarative DataFrame algebra —

  tokens explode → per-doc term frequencies (query terms only — the
  filter prunes before the shuffle) → tiny per-term document-frequency
  aggregate (broadcast) → per-doc score → TakeOrdered top-k

so the corpus is scanned once, the shuffled volume is one row per
(matching doc, query term), and nothing but the k winners reaches the
driver.  At 100 TB, build :func:`bm25_index` once — postings with
denormalized doc lengths plus per-term dfs — and run every query
through ``BM25Index.search``; the corpus is never re-scanned.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .hashing import ws_tokens

__all__ = [
    "bm25_topk",
    "bm25_index",
    "bm25_index_load",
    "bm25_index_update",
    "BM25Index",
    "tfidf_keywords",
    "rrf_fuse",
]


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 (Robertson/Sparck-Jones idf with the +1
    smoothing that keeps it positive):

        idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)
        score(d) = Σ_t idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl))

    Deterministic output order (score desc, id asc), rounded to 6
    decimals for cross-engine stability."""
    toks = df.select(
        F.col(id_col),
        F.explode(ws_tokens(F.col(text_col))).alias("__t"),
    )
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("double").alias("__dl"))
    corpus = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    qt = [str(t) for t in query_terms]
    tf = (
        toks.filter(F.col("__t").isin(qt))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(corpus))
    )
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    denom = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    contrib = idf * F.col("__tf") / denom
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


@dataclass
class BM25Index:
    """Query-independent BM25 state, built once and reused per query —
    the 100 TB retrieval pattern promised in the module docstring.

    ``postings`` carries (term, doc_id, tf, dl): the doc length is
    denormalized into every posting row (one extra double) so a search
    needs NO join against a doc-stats table — just the tiny per-term df
    broadcast.  ``n_docs``/``avgdl`` are two scalars collected at build
    time (a designed driver boundary: two numbers, not data).

    At cluster scale, write ``postings`` to parquet partitioned/bucketed
    by term (``postings.write.bucketBy(N, "term")``): a search then
    prunes to the query terms' buckets and the corpus is never
    re-scanned.  Locally ``persist=True`` keeps both frames pinned
    MEMORY_AND_DISK for the same effect."""

    postings: DataFrame
    term_stats: DataFrame
    n_docs: float
    avgdl: float
    id_col: str
    k1: float
    b: float
    # set on indexes reopened from parquet: postings carry a __bucket
    # partition column = pmod(hash(term), n_buckets)
    n_buckets: int | None = None

    def search(self, query_terms: list[str], k: int = 10) -> DataFrame:
        """Top-k for one query against the prebuilt index: filter the
        inverted index to the query terms (pushable predicate), one
        broadcast of the matching term dfs, one shuffle on doc id.
        Identical output to :func:`bm25_topk` on the same corpus.

        On a parquet-backed index the search also applies
        ``__bucket == pmod(hash(<term literal>), n_buckets)`` per query
        term — ``hash`` of a literal constant-folds, so Catalyst prunes
        the postings scan to the query terms' partitions."""
        qt = [str(t) for t in query_terms]
        tf = self.postings
        if self.n_buckets and "__bucket" in tf.columns:
            pred = F.lit(False)
            for t in qt:
                pred = pred | (
                    F.col("__bucket")
                    == F.pmod(F.hash(F.lit(t)), F.lit(self.n_buckets))
                )
            tf = tf.filter(pred).drop("__bucket")
        tf = tf.filter(F.col("term").isin(qt))
        dfreq = self.term_stats.filter(F.col("term").isin(qt))
        idf = F.log(
            (F.lit(self.n_docs) - F.col("__df") + 0.5)
            / (F.col("__df") + 0.5)
            + 1.0
        )
        denom = F.col("__tf") + F.lit(self.k1) * (
            F.lit(1.0 - self.b)
            + F.lit(self.b) * F.col("__dl") / F.lit(self.avgdl)
        )
        contrib = idf * F.col("__tf") / denom
        return (
            tf.join(F.broadcast(dfreq), "term")
            .groupBy(self.id_col)
            .agg(F.round(F.sum(contrib), 6).alias("score"))
            .orderBy(F.desc("score"), F.col(self.id_col))
            .limit(k)
        )

    def unpersist(self) -> None:
        for frame in (self.postings, self.term_stats):
            try:
                frame.unpersist()
            except Exception:
                pass

    def save(self, path: str, n_buckets: int = 64) -> None:
        """Materialize the index as parquet tables under ``path`` — the
        cluster-scale form.  Postings are written bucketed-by-term-hash
        (``pmod(hash(term), n_buckets)`` as a partition column) so a
        search's term filter prunes to the query terms' partitions and
        the corpus is never touched again.  The two corpus scalars ride
        along as a 1-row parquet."""
        (
            self.postings.withColumn(
                "__bucket", F.pmod(F.hash("term"), F.lit(n_buckets))
            )
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(f"{path}/postings")
        )
        self.term_stats.write.mode("overwrite").parquet(f"{path}/term_stats")
        self.postings.sparkSession.createDataFrame(
            [(self.n_docs, self.avgdl, self.id_col, self.k1, self.b, n_buckets)],
            "n_docs double, avgdl double, id_col string, k1 double, b double, n_buckets int",
        ).write.mode("overwrite").parquet(f"{path}/meta")


def bm25_index_load(spark, path: str) -> BM25Index:
    """Reopen an index written by :meth:`BM25Index.save`; ``search`` on
    it partition-prunes the postings scan via the ``__bucket``
    predicate (see :meth:`BM25Index.search`)."""
    meta = spark.read.parquet(f"{path}/meta").first()
    postings = spark.read.parquet(f"{path}/postings")
    term_stats = spark.read.parquet(f"{path}/term_stats")
    return BM25Index(
        postings=postings,
        term_stats=term_stats,
        n_docs=float(meta["n_docs"]),
        avgdl=float(meta["avgdl"]),
        id_col=meta["id_col"],
        k1=float(meta["k1"]),
        b=float(meta["b"]),
        n_buckets=int(meta["n_buckets"]),
    )


def bm25_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    persist: bool = True,
) -> BM25Index:
    """Build the reusable BM25 index: one corpus scan total.

    The same tokenize → per-doc tf aggregation as :func:`bm25_topk`,
    WITHOUT the query-term filter, so every term's postings and df are
    computed once; subsequent ``search()`` calls touch only the index."""
    toks = df.select(
        F.col(id_col),
        F.explode(ws_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    # dl = sum of tfs per doc — no second corpus scan; denormalized onto
    # every posting row by a window over the doc-id partitioning the
    # groupBy just established (no extra exchange)
    from pyspark.sql import Window

    w = Window.partitionBy(id_col)
    postings = tf.withColumn("__dl", F.sum("__tf").over(w))
    term_stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    if persist:
        postings = postings.persist()
        term_stats = term_stats.persist()
    n_docs, avgdl = (
        postings.select(
            F.countDistinct(id_col).cast("double"),
            (F.sum("__tf") / F.countDistinct(id_col)),
        ).first()
    )
    return BM25Index(
        postings=postings,
        term_stats=term_stats,
        n_docs=float(n_docs),
        avgdl=float(avgdl),
        id_col=id_col,
        k1=k1,
        b=b,
    )


def bm25_index_update(
    spark, path: str, new_df: DataFrame, text_col: str, id_col: str
) -> BM25Index:
    """Merge a batch of NEW documents into a parquet-backed index
    (:meth:`BM25Index.save`) WITHOUT rebuilding — the incremental
    corpus-maintenance path: only the batch is tokenized; existing
    postings are never rescanned.

    Steps, in crash-ordered sequence:

    1. the batch's postings (term, doc_id, tf, dl, __bucket) are
       APPENDED to the postings table — new files only, partition
       layout preserved, so search-time bucket pruning keeps working;
    2. per-term document frequencies are additive: the batch's term dfs
       are merged into ``term_stats`` through the crash-safe keyed
       upsert (``sources.upsert_table``);
    3. ``meta`` is rewritten with the incrementally-updated scalars
       (n_docs += batch docs; avgdl from total token mass, exact).

    Caller contract: ``new_df``'s ids must not already be indexed (pair
    with ``minhash_index.dedup_new`` / ``snapshot_diff`` upstream — an
    id-level anti-join here would rescan the whole postings table,
    defeating the point).  Crash caveat: a failure between steps leaves
    appended postings without matching stats; re-apply the SAME batch
    after removing its appended files, or rebuild — the steps are
    ordered so stats never reference missing postings.

    Returns the reopened index."""
    from ..sources import upsert_table

    meta = spark.read.parquet(f"{path}/meta").first()
    n_buckets = int(meta["n_buckets"])
    toks = new_df.select(
        F.col(id_col).alias("__id"),
        F.explode(ws_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("__id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__id")
    postings = tf.withColumn("__dl", F.sum("__tf").over(w)).select(
        F.col("__id").alias(meta["id_col"]),
        "term",
        "__tf",
        "__dl",
        F.pmod(F.hash("term"), F.lit(n_buckets)).alias("__bucket"),
    )
    # batch scalars BEFORE the append (one tiny agg over the batch only)
    b = postings.agg(
        F.countDistinct(meta["id_col"]).cast("double").alias("nd"),
        F.sum("__tf").alias("mass"),
        F.count(F.lit(1)).cast("double").alias("npost"),
    ).first()
    if not b["nd"]:
        return bm25_index_load(spark, path)
    postings.write.partitionBy("__bucket").mode("append").parquet(
        f"{path}/postings"
    )
    batch_stats = postings.groupBy("term").agg(
        F.countDistinct(meta["id_col"]).cast("double").alias("__bdf")
    )
    old_stats = spark.read.parquet(f"{path}/term_stats")
    # delta-sized: dfs are additive, so only terms the batch touched
    # need new rows — batch-side left join, then keyed upsert
    merged = batch_stats.join(old_stats, "term", "left_outer").select(
        "term",
        (F.col("__bdf") + F.coalesce(F.col("__df"), F.lit(0.0))).alias("__df"),
    )
    upsert_table(spark, f"{path}/term_stats", merged, "term")
    n_old, avg_old = float(meta["n_docs"]), float(meta["avgdl"])
    n_new = n_old + float(b["nd"])
    avg_new = (avg_old * n_old + float(b["mass"])) / n_new
    spark.createDataFrame(
        [
            (
                n_new,
                avg_new,
                meta["id_col"],
                float(meta["k1"]),
                float(meta["b"]),
                n_buckets,
            )
        ],
        "n_docs double, avgdl double, id_col string, k1 double, b double, n_buckets int",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    return bm25_index_load(spark, path)


def bm25_topk_sql(
    table: str,
    text_tokens_sql: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same formula, same op order)."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""
    WITH tk AS (
      SELECT {id_col}, unnest({text_tokens_sql}) AS t FROM {table}
    ), doclen AS (
      SELECT {id_col}, CAST(COUNT(*) AS DOUBLE) AS dl FROM tk GROUP BY {id_col}
    ), corpus AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM doclen
    ), tf AS (
      SELECT {id_col}, t, CAST(COUNT(*) AS DOUBLE) AS tf FROM tk
      WHERE t IN ({terms}) GROUP BY {id_col}, t
    ), dfreq AS (
      SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t
    )
    SELECT {id_col},
           ROUND(SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                     * tf / (tf + {k1} * ({1.0 - b} + {b} * dl / avgdl))), 6)
             AS score
    FROM tf JOIN dfreq USING (t) JOIN doclen USING ({id_col}), corpus
    GROUP BY {id_col}
    ORDER BY score DESC, {id_col} LIMIT {k}
    """


def tfidf_keywords(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_df: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the keyword-extraction
    / topic-tagging primitive.  Smoothed idf (the scikit-learn
    ``TfidfTransformer(smooth_idf=True)`` form, public docs):

        idf(t)   = ln((N + 1)/(df(t) + 1)) + 1
        score    = tf(d, t) · idf(t)

    Returns (id, token, tf, score, rnk) for each document's top ``k``
    tokens; deterministic order by (ROUNDED score desc, token asc) —
    the BM25 rows' cross-engine discipline (ranking on the rounded
    value keeps both engines' orderings identical wherever their ln
    ulps agree post-round; the margin checker vets the boundaries).
    ``min_df`` drops tokens seen in fewer than that many documents
    (typo/hapax suppression) BEFORE scoring.

    Scale shape: one corpus-sized explode + (doc, token) GROUP BY —
    the only corpus shuffles; document frequencies are
    vocabulary-sized (broadcast join) and the doc count is a 1-row
    broadcast.  The per-doc top-k window partitions on the document
    id: a task holds one document's distinct tokens, bounded by the
    longest document, never by the corpus."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("__t")
    )
    tf = toks.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("__df") >= min_df)
    corpus = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    score = F.round(
        F.col("__tf").cast("double")
        * (
            F.log(
                (F.col("__n") + 1.0) / (F.col("__df").cast("double") + 1.0)
            )
            + 1.0
        ),
        round_digits,
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(corpus))
        .select(F.col(id_col), F.col("__t"), F.col("__tf"), score.alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.col("__t"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col(id_col),
            F.col("__t").alias("token"),
            F.col("__tf").cast("long").alias("tf"),
            "score",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str,
    k: int = 60,
    topk: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR
    2009): fuse R ranked lists into one by

        rrf(d) = Σ_lists 1/(k + rank_list(d))

    — the standard hybrid-search combiner (BM25 ⊕ dense cosine):
    rank-based, so the lists' incomparable score scales never need
    calibrating; ``k`` (default 60, the paper's constant) damps the
    top-rank dominance.  A document absent from a list contributes
    nothing for it.  Returns (id, n_lists, rrf_score) ordered by
    (rounded score desc, id) — ties to the smaller id — limited to
    ``topk`` when given.

    Cross-engine determinism: each term 1/(k + rank) is one correctly
    rounded division of exact integers, and the per-document sum runs
    over ≤ R ≈ 2-3 such terms (the rounding discipline the BM25 rows
    established covers the final ROUND).

    Scale shape: inputs are retrieval OUTPUTS (top-k-sized, not
    corpus-sized) — one union + one keyed aggregate over ≤ R·k rows;
    the ORDER BY runs on the fused frame of the same size.  Fusing
    corpus-sized rankings is a misuse (rank the corpus with the
    prefix.py family first, then fuse the heads)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = [
        r.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias("__rank"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    score = F.sum(1.0 / (F.lit(float(k)) + F.col("__rank").cast("double")))
    agg = u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.round(score, round_digits).alias("rrf_score"),
    )
    out = agg.orderBy(F.desc("rrf_score"), F.col(id_col))
    if topk is not None:
        out = out.limit(topk)
    return out
