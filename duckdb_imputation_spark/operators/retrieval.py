"""Full-text retrieval: BM25 scoring over a document corpus.

The classic training-data / RAG building block: score documents against
a bag-of-words query with BM25 and return the top-k.  Everything is
declarative DataFrame algebra —

  tokens explode → per-doc term frequencies (query terms only — the
  filter prunes before the shuffle) → tiny per-term document-frequency
  aggregate (broadcast) → per-doc score → TakeOrdered top-k

so the corpus is scanned once, the shuffled volume is one row per
(matching doc, query term), and nothing but the k winners reaches the
driver.  At 100 TB, pre-compute ``doc_stats``/``term_stats`` once and
reuse across queries (they are query-independent except the df filter).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .hashing import ws_tokens

__all__ = ["bm25_topk"]


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
