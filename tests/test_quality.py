"""ml/quality.py — model-based quality filtering: the in-engine
training loop against a pure-NumPy replica over Python-computed gopher
features, scoring consistency, and the classifier's separation of its
own weak labels (rank-sum AUC)."""

import re

import numpy as np
from pyspark.sql import functions as F

from duckdb_imputation_spark.ml.quality import (
    QUALITY_FEATURE_NAMES,
    quality_features,
    quality_probability_expr,
    train_quality_classifier,
)

SF = "/root/testdata/sf0.001"


def _py_features(text):
    """Python replica of quality_features (gopher integer counts +
    O(1) rational scaling)."""
    t = text or ""
    toks = t.split()
    n_words = len(toks)
    swl = sum(len(w) for w in toks)
    n_symbol = t.count("#") + t.count("...")
    n_alpha = sum(1 for w in toks if re.search("[A-Za-z]", w))
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    low = {w.lower() for w in toks}
    n_stop = len(stops & low)
    keep = (
        10 <= n_words <= 100000
        and n_words > 0
        and 2 * n_words <= swl <= 10 * n_words
        and n_symbol * 10 <= n_words
        and n_alpha * 5 >= n_words * 4
        and n_stop >= 1
    )
    nw = max(n_words, 1)
    return (
        [
            min(n_words, 1000) / 100.0,
            swl / (10.0 * nw),
            n_alpha / nw,
            min(n_stop, 8) / 8.0,
        ],
        1.0 if keep else 0.0,
    )


def _py_bgd(X, y, iters=3, lr=1.0):
    w = np.zeros(X.shape[1] + 1)
    Xb = np.hstack([np.ones((X.shape[0], 1)), X])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w = w - lr * (Xb.T @ (p - y)) / len(y)
    return w


def test_features_match_python_replica(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = quality_features(F.col("text"))
    got = (
        docs.select(
            "doc_id",
            *[feats[n].alias(n) for n in QUALITY_FEATURE_NAMES],
            feats["y"].alias("y"),
        )
        .orderBy("doc_id")
        .collect()
    )
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    for r in got:
        exp, keep = _py_features(texts[r["doc_id"]])
        for name, e in zip(QUALITY_FEATURE_NAMES, exp):
            assert abs(r[name] - e) < 1e-12, (r["doc_id"], name)
        assert r["y"] == keep, r["doc_id"]


def test_training_matches_numpy_bgd(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = train_quality_classifier(docs, "text", iters=3, lr=1.0)
    rows = [
        _py_features(r["text"]) for r in docs.select("text").collect()
    ]
    X = np.array([f for f, _ in rows])
    y = np.array([lab for _, lab in rows])
    w_np = _py_bgd(X, y, iters=3, lr=1.0)
    # sum-order float noise only: agreement far below any decision
    # surface
    assert np.allclose(w, w_np, atol=1e-9), (w, w_np)


def test_probability_expr_matches_weights(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    w = [0.2, -0.5, 1.0, 0.3, 2.0]  # fixed weights: pure scoring test
    got = docs.select(
        "text", quality_probability_expr(F.col("text"), w).alias("p")
    ).collect()
    for r in got:
        x, _ = _py_features(r["text"])
        z = w[0] + sum(wi * xi for wi, xi in zip(w[1:], x))
        assert abs(r["p"] - 1.0 / (1.0 + np.exp(-z))) < 1e-12


def test_classifier_separates_weak_labels(spark):
    """The distilled probability must RANK the rule labels well:
    rank-sum AUC of prob vs label comfortably above chance (the whole
    point of the distillation)."""
    from duckdb_imputation_spark.operators.stats import auc_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = train_quality_classifier(docs, "text", iters=3, lr=1.0)
    feats = quality_features(F.col("text"))
    frame = docs.select(
        *[feats[n].alias(n) for n in QUALITY_FEATURE_NAMES],
        feats["y"].cast("int").alias("label"),
    )
    from duckdb_imputation_spark.ml.logreg import logreg_predict_expr

    scored = frame.select(
        "label",
        logreg_predict_expr(QUALITY_FEATURE_NAMES, w).alias("p"),
    )
    row = auc_score(scored, "label", "p", round_digits=None).collect()[0]
    assert row["n_pos"] > 0 and row["n_neg"] > 0
    assert row["auc"] > 0.75, row["auc"]
