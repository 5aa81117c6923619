"""Unit tests for ml/logreg.py against a pure-Python BGD reference."""

import math

from pyspark.sql import functions as F

from duckdb_imputation_spark.ml.logreg import (
    logreg_predict_expr,
    logreg_train,
)


def _py_train(rows, d, iters, lr, l2=0.0):
    w = [0.0] * (d + 1)
    for _ in range(iters):
        g = [0.0] * (d + 1)
        n = 0
        for y, *xs in rows:
            z = w[0] + sum(w[j + 1] * xs[j] for j in range(d))
            p = 1.0 / (1.0 + math.exp(-z))
            e = p - y
            g[0] += e
            for j in range(d):
                g[j + 1] += e * xs[j]
            n += 1
        w = [
            w[j] - lr * (g[j] / n + (l2 * w[j] if j > 0 else 0.0))
            for j in range(d + 1)
        ]
    return w


def _sep_rows():
    import random

    rng = random.Random(31)
    rows = []
    for _ in range(300):
        x1 = rng.uniform(-1, 1)
        x2 = rng.uniform(-1, 1)
        y = 1 if (2.0 * x1 - x2 + rng.uniform(-0.4, 0.4)) > 0 else 0
        rows.append((y, x1, x2))
    return rows


def test_logreg_matches_python_reference(spark):
    rows = _sep_rows()
    df = spark.createDataFrame(rows, "y int, x1 double, x2 double")
    for l2 in (0.0, 0.1):
        w = logreg_train(df, ["x1", "x2"], "y", iters=4, lr=1.0, l2=l2)
        ref = _py_train(rows, 2, 4, 1.0, l2)
        for a, b in zip(w, ref):
            assert abs(a - b) < 1e-9, (l2, w, ref)


def test_logreg_learns_separable_direction_and_predicts(spark):
    rows = _sep_rows()
    df = spark.createDataFrame(rows, "y int, x1 double, x2 double")
    # NULL rows must be dropped before the loop
    df = df.unionByName(
        spark.createDataFrame(
            [(None, 0.5, 0.5), (1, None, 0.0)],
            "y int, x1 double, x2 double",
        )
    )
    w = logreg_train(df, ["x1", "x2"], "y", iters=25, lr=2.0)
    assert w[1] > 0 > w[2]  # learned the generating direction
    scored = df.where(F.col("y").isNotNull() & F.col("x1").isNotNull()).select(
        "y",
        (logreg_predict_expr(["x1", "x2"], w) > 0.5)
        .cast("int")
        .alias("pred"),
    )
    acc = scored.where(F.col("y") == F.col("pred")).count() / scored.count()
    assert acc > 0.85, acc
