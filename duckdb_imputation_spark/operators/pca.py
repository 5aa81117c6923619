"""PCA over embedding columns: exact distributed second-moment
aggregation, driver-side eigendecomposition, Column-expression
projection.

The reduction step for the similarity-search path (project 768-dim
embeddings to k dims before IVF/PQ — the standard recall/cost trade).
The shape mirrors the engine's cofactor design (SURVEY §1.2): the
distributed pass computes the SAME statistics a ring triple holds for
scalar columns — count, per-dimension sums, and the full second-moment
(Gram) matrix — then training is a driver-side ``numpy.linalg.eigh`` on
the d x d covariance (d², not n, bounds driver memory; identical to how
linreg/QDA train from sigma matrices, ml/sigma.py).

The Gram pass uses ``mapInPandas``: one float64 ``X.T @ X`` per Arrow
batch, ONE partial row emitted per batch, driver-combined.  Per-row
outer products never materialize and nothing corpus-sized shuffles —
the collect moves ``n_batches x d²`` doubles.  Projection is a
sequential ``F.aggregate`` fold per component (matching DuckDB's
``list_reduce`` evaluation order, so rounded scores are bit-identical
cross-engine — the embedding_cosine_scores convention).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PCAModel", "gram_stats", "pca_np", "pca_train", "pca_project", "pca_save", "pca_load"]


def gram_stats(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """Exact ``(n, sum_vec, X^T X)`` over an ``array<float/double>``
    column — one narrow scan, no shuffle (partials combine on the
    driver: one row per Arrow batch)."""
    src = df.select(F.col(vec_col).alias("v")).filter(F.col("v").isNotNull())

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in b["v"]])
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = src.mapInPandas(
        partials, "n long, s array<double>, g array<double>"
    ).collect()
    if not rows:
        raise ValueError(f"gram_stats: no non-null rows in {vec_col!r}")
    d = len(rows[0]["s"])
    n = sum(r["n"] for r in rows)
    s = np.zeros(d)
    G = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        G += np.asarray(r["g"]).reshape(d, d)
    return n, s, G


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray          # (d,) — zeros when center=False
    components: np.ndarray    # (k, d) rows = principal axes, desc variance
    explained_variance: np.ndarray  # (k,)


def pca_np(
    n: int, s: np.ndarray, G: np.ndarray, k: int, center: bool = True
) -> PCAModel:
    """Eigendecomposition of the covariance assembled from the moment
    statistics (shared with the DuckDB-trained oracle twin).  Sign
    convention: each component's largest-|coordinate| entry is positive
    (first such index on exact ties), so the decomposition is
    deterministic across BLAS builds."""
    mean = s / n if center else np.zeros_like(s)
    denom = max(n - 1, 1)
    cov = (G - np.outer(s, s) / n) / denom if center else G / denom
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return PCAModel(mean, comps, np.maximum(w[order], 0.0))


def pca_train(
    df: DataFrame, vec_col: str, k: int, center: bool = True
) -> PCAModel:
    n, s, G = gram_stats(df, vec_col)
    return pca_np(n, s, G, k, center=center)


def pca_project(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    out_cols: Sequence[str] | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Append one double column per component: ``(x - mean) . c_j`` as a
    sequential fold (codegen'd JVM expression — no Python in the
    projection path).  ``round_to`` applies the cross-engine rounding
    convention for oracle rows."""
    k = len(model.components)
    if out_cols is None:
        out_cols = [f"pc{j}" for j in range(k)]
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df
    for j, name in enumerate(out_cols):
        comp = model.components[j]
        mean = model.mean
        terms = F.zip_with(
            vec,
            F.array(*[F.lit(float(c)) for c in comp]),
            lambda x, c: x * c,
        )
        proj = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t) - F.lit(
            float(np.dot(mean, comp))
        )
        if round_to is not None:
            proj = F.round(proj, round_to) + F.lit(0.0)
        out = out.withColumn(name, proj)
    return out


def pca_save(spark, model: PCAModel, path: str) -> None:
    """Persist the model as parquet (mean row + one row per component)
    — train once per corpus snapshot, reuse across projection jobs."""
    rows = [(-1, [float(x) for x in model.mean], 0.0)] + [
        (j, [float(x) for x in model.components[j]], float(model.explained_variance[j]))
        for j in range(len(model.components))
    ]
    spark.createDataFrame(
        rows, "idx int, vec array<double>, explained_variance double"
    ).write.mode("overwrite").parquet(path)


def pca_load(spark, path: str) -> PCAModel:
    """Reload a model saved by :func:`pca_save`."""
    rows = {r["idx"]: r for r in spark.read.parquet(path).collect()}
    mean = np.asarray(rows[-1]["vec"])
    ks = sorted(k for k in rows if k >= 0)
    comps = np.asarray([rows[k]["vec"] for k in ks])
    ev = np.asarray([rows[k]["explained_variance"] for k in ks])
    return PCAModel(mean, comps, ev)
