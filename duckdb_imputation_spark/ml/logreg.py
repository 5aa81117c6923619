"""Logistic regression fully in-engine — batch gradient descent where
each iteration is ONE aggregate over one scan.

Beyond-reference ML (the reference engine ships linreg/LDA/QDA/NB;
logistic loss does NOT factorize through the cofactor triple — the
sigmoid couples every feature to the weights — so the training loop is
the per-iteration-aggregate pattern instead of the one-pass sufficient
statistic): standard BGD on the logistic negative log-likelihood
(public textbook form, e.g. Bishop PRML §4.3.2),

    p_i      = σ(w·x_i + b)
    ∇_j      = Σ_i (p_i − y_i)·x_ij / n   (+ λ·w_j)
    w_j(t+1) = w_j(t) − η·∇_j

Scale shape: the weight vector is d+1 doubles on the DRIVER (the
pagerank-dangling-mass class of designed boundary); each iteration
ships it back as literals inside ONE aggregate expression — no
windows, no joins, no per-row Python, partial aggregation map-side.
Total cost = iters × one scan (cache the input for the loop).
Feature scaling is the caller's job (BGD's usual conditioning
caveat); the catalog row feeds O(1)-scaled features.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_train", "logreg_predict_expr"]


def _z(feature_cols: Sequence[str], w: list[float]) -> Column:
    z: Column = F.lit(float(w[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(w[j + 1])) * F.col(c).cast("double")
    return z


def logreg_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 5,
    lr: float = 1.0,
    l2: float = 0.0,
    cache: bool = True,
) -> list[float]:
    """Train binary logistic regression; returns
    ``[intercept, w_1, …, w_d]`` after exactly ``iters`` full-batch
    gradient steps from the zero vector (fixed iteration count and
    zero init keep the run deterministic and SQL-twin-able — no early
    stop, no random init).  ``label_col`` must be 0/1 (NULL-label or
    NULL-feature rows are dropped once, before the loop).

    Each iteration: ONE aggregate producing the d+1 gradient sums and
    the count; the weight update runs on the driver (d+1 doubles, the
    designed boundary).  ``l2`` regularizes the non-intercept weights
    only (the linreg convention)."""
    feats = list(feature_cols)
    cond = F.col(label_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    src = df.where(cond).select(
        F.col(label_col).cast("double").alias("__y"),
        *[F.col(c).cast("double").alias(c) for c in feats],
    )
    if cache:
        src = src.localCheckpoint(eager=False)
    w = [0.0] * (len(feats) + 1)
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(feats, w)))
        err = p - F.col("__y")
        aggs = [F.sum(err).alias("g0")]
        aggs += [
            F.sum(err * F.col(c)).alias(f"g{j + 1}")
            for j, c in enumerate(feats)
        ]
        aggs.append(F.count(F.lit(1)).cast("double").alias("n"))
        row = src.agg(*aggs).first()
        n = float(row["n"])
        if n == 0:
            raise ValueError("no trainable rows (labels/features all NULL)")
        w = [
            w[j]
            - lr
            * (
                float(row[f"g{j}"]) / n
                + (l2 * w[j] if j > 0 else 0.0)
            )
            for j in range(len(w))
        ]
    return w


def logreg_predict_expr(
    feature_cols: Sequence[str], weights: Sequence[float]
) -> Column:
    """σ(w·x + b) as a Column — the probability of class 1 under a
    trained model (pure JVM expression; threshold at 0.5 for the hard
    class)."""
    w = [float(x) for x in weights]
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(list(feature_cols), w)))
