"""Model-based document quality filtering — a classifier distilled
from rule labels, trained fully in-engine.

The modern corpus-curation pattern (CCNet, Wenzek et al. 2020;
FineWeb-Edu, Penedo et al. 2024): hand rules produce WEAK labels, a
cheap classifier is trained on those labels, and the classifier's
probability — smoother and better-calibrated than the rule
conjunction — becomes the corpus filter / mixing weight.  Here the
weak labels are the Gopher rule conjunction (textstats.gopher_rules,
Rae et al. 2021 §A.1.1) and the classifier is the in-engine logistic
regression (ml/logreg.py: iters × ONE map-side-combined aggregate
scan, weights = d+1 doubles on the driver).

Features are the gopher integer counts squashed to O(1) scale —
rational expressions only (LEAST / GREATEST / division), no
transcendentals, so the feature surface is bit-identical across
engines and the only cross-engine double noise is the training loop's
σ sums (the logreg rows' established stat-class margin).

Scale shape: feature extraction is one pass of built-in Column
functions (no Python), training is iters scans of the checkpointed
slim feature frame, scoring is a pure JVM projection — the classifier
applies to a 100 TB corpus at scan cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.textstats import gopher_rules
from .logreg import logreg_train

__all__ = [
    "quality_features",
    "train_quality_classifier",
    "quality_probability_expr",
    "QUALITY_FEATURE_NAMES",
]

QUALITY_FEATURE_NAMES = ["x_words", "x_mwl", "x_alpha", "x_stop"]


def quality_features(col: Column) -> dict[str, Column]:
    """O(1)-scaled rational features from the gopher integer counts
    (one tokenization pass; every expression is LEAST/GREATEST/CAST/
    division — exact doubles, no libm):

    * ``x_words``: min(n_words, 1000) / 100 — capped doc length
    * ``x_mwl``:   mean word length / 10 (÷ max(n_words, 1))
    * ``x_alpha``: alphabetic-word fraction
    * ``x_stop``:  min(stopword hits, 8) / 8

    plus ``y``: the gopher ``keep`` conjunction as the 0/1 weak label.
    """
    r = gopher_rules(col)
    nw = F.greatest(r["n_words"], F.lit(1)).cast("double")
    return {
        "x_words": F.least(r["n_words"], F.lit(1000)).cast("double")
        / F.lit(100.0),
        "x_mwl": r["sum_word_len"].cast("double") / (F.lit(10.0) * nw),
        "x_alpha": r["n_alpha_words"].cast("double") / nw,
        "x_stop": F.least(r["n_gopher_stopwords"], F.lit(8)).cast("double")
        / F.lit(8.0),
        "y": r["keep"].cast("double"),
    }


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    iters: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Train the quality classifier on ``df``'s ``text_col`` against
    the gopher-rule weak labels; returns ``[intercept, w_x_words,
    w_x_mwl, w_x_alpha, w_x_stop]`` after exactly ``iters`` full-batch
    gradient steps from zero (deterministic, SQL-twin-able — the
    logreg_train contract)."""
    feats = quality_features(F.col(text_col))
    frame = df.select(
        *[feats[n].alias(n) for n in QUALITY_FEATURE_NAMES],
        feats["y"].alias("__label"),
    )
    return logreg_train(
        frame, QUALITY_FEATURE_NAMES, "__label", iters=iters, lr=lr
    )


def quality_probability_expr(col: Column, weights: list[float]) -> Column:
    """P(quality) of a document under trained ``weights`` — σ(w·x + b)
    over the same feature expressions, as one pure JVM Column (the
    filter expression for the 100 TB scan: no shuffle, no Python).

    Convenience form: inlines the four feature expressions, each of
    which re-tokenizes the text.  For a scoring PROJECTION over a
    corpus, materialize ``quality_features`` once in its own select
    and apply ``logreg_predict_expr(QUALITY_FEATURE_NAMES, weights)``
    over the feature columns — one tokenization per row (the
    text_stats single-bind discipline)."""
    feats = quality_features(col)
    z: Column = F.lit(float(weights[0]))
    for j, name in enumerate(QUALITY_FEATURE_NAMES):
        z = z + F.lit(float(weights[j + 1])) * feats[name]
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
