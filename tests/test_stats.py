"""Unit tests for operators/stats.py — Welch t-test and chi-squared
independence against pure-Python references."""

import math
import random

from duckdb_imputation_spark.operators.stats import (
    chi2_independence,
    welch_ttest,
)


def _py_welch(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = (sum(x * x for x in xs) - sum(xs) ** 2 / na) / (na - 1)
    vb = (sum(y * y for y in ys) - sum(ys) ** 2 / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, dof


def test_welch_matches_python_reference(spark):
    rng = random.Random(19)
    rows = []
    for h in range(3):
        for _ in range(40):
            rows.append((h, "a", float(rng.randrange(50, 150))))
        for _ in range(25):
            rows.append((h, "b", float(rng.randrange(80, 200))))
        rows.append((h, "c", 999.0))  # third cohort: must be ignored
    df = spark.createDataFrame(rows, "h int, g string, v double")
    out = {
        r["h"]: r
        for r in welch_ttest(df, "g", "v", "a", "b", by_cols=["h"]).collect()
    }
    for h in range(3):
        xs = [v for hh, g, v in rows if hh == h and g == "a"]
        ys = [v for hh, g, v in rows if hh == h and g == "b"]
        t, dof = _py_welch(xs, ys)
        r = out[h]
        assert (r["n_a"], r["n_b"]) == (len(xs), len(ys))
        assert abs(r["mean_a"] - sum(xs) / len(xs)) < 1e-4
        assert abs(r["t_stat"] - t) < 2e-4, (h, r["t_stat"], t)
        assert abs(r["dof"] - dof) < 2e-4, (h, r["dof"], dof)


def test_welch_undefined_cases(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0),  # n_b < 2
         ], "g string, v double",
    )
    r = welch_ttest(df, "g", "v", "a", "b").collect()[0]
    assert r["t_stat"] is None and r["dof"] is None
    # zero variance on both sides
    df2 = spark.createDataFrame(
        [("a", 3.0)] * 4 + [("b", 3.0)] * 4, "g string, v double"
    )
    r2 = welch_ttest(df2, "g", "v", "a", "b").collect()[0]
    assert r2["t_stat"] is None
    assert r2["n_a"] == r2["n_b"] == 4


def _py_chi2(pairs):
    from collections import Counter

    obs = Counter(pairs)
    ra, cb = Counter(), Counter()
    for (a, b), c in obs.items():
        ra[a] += c
        cb[b] += c
    n = sum(obs.values())
    chi2 = 0.0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            o = obs.get((a, b), 0)
            chi2 += (o - e) ** 2 / e
    return chi2, (len(ra) - 1) * (len(cb) - 1), n


def test_chi2_matches_python_reference(spark):
    rng = random.Random(4)
    pairs = []
    for _ in range(500):
        a = rng.choice(["x", "y", "z"])
        # dependence: "x" pulls category 0
        b = 0 if (a == "x" and rng.random() < 0.7) else rng.randrange(4)
        pairs.append((a, b))
    pairs.append((None, 1))  # NULLs dropped
    pairs.append(("x", None))
    df = spark.createDataFrame(pairs, "a string, b int")
    r = chi2_independence(df, "a", "b").collect()[0]
    want_chi2, want_dof, want_n = _py_chi2(
        [(a, b) for a, b in pairs if a is not None and b is not None]
    )
    assert r["dof"] == want_dof
    assert r["n"] == want_n
    assert abs(r["chi2"] - want_chi2) < 2e-4


def test_chi2_unobserved_cell_contributes_expectation(spark):
    # 2x2 with one empty cell: ("p", 1) never occurs
    pairs = [("p", 0)] * 10 + [("q", 0)] * 5 + [("q", 1)] * 5
    df = spark.createDataFrame(pairs, "a string, b int")
    r = chi2_independence(df, "a", "b").collect()[0]
    want_chi2, want_dof, want_n = _py_chi2(pairs)
    assert r["dof"] == 1 and r["n"] == 20
    assert abs(r["chi2"] - want_chi2) < 1e-4
