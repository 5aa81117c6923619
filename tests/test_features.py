"""Unit tests for operators/features.py — target encoding and rare-
category collapse against pure-Python references."""

from duckdb_imputation_spark.operators.features import (
    collapse_rare_categories,
    target_encode,
)


ROWS = [
    ("a", 10.0), ("a", 20.0), ("a", 30.0),
    ("b", 100.0), ("b", 200.0),
    ("c", 50.0),            # singleton
    (None, 40.0),           # NULL category -> prior
    ("a", None),            # NULL target -> plain code
]


def _prior():
    ys = [y for _, y in ROWS if y is not None]
    return sum(ys) / len(ys)


def test_target_encode_smoothed(spark):
    df = spark.createDataFrame(ROWS, "c string, y double")
    m = 4.0
    got = target_encode(
        df, "c", "y", smoothing=m, round_digits=None
    ).collect()
    p = _prior()
    stats = {}
    for c, y in ROWS:
        if c is not None and y is not None:
            n, s = stats.get(c, (0, 0.0))
            stats[c] = (n + 1, s + y)
    for r in got:
        c, y = r["c"], r["y"]
        if c is None:
            exp = p
        else:
            n, s = stats[c]
            exp = (s + m * p) / (n + m)
        assert abs(r["te"] - exp) < 1e-12, (c, y)


def test_target_encode_loo(spark):
    df = spark.createDataFrame(ROWS, "c string, y double")
    m = 4.0
    got = target_encode(
        df, "c", "y", smoothing=m, loo=True, round_digits=None
    ).collect()
    p = _prior()
    stats = {}
    for c, y in ROWS:
        if c is not None and y is not None:
            n, s = stats.get(c, (0, 0.0))
            stats[c] = (n + 1, s + y)
    for r in got:
        c, y = r["c"], r["y"]
        if c is None:
            exp = p
        elif y is None:  # nothing to leak: plain code
            n, s = stats[c]
            exp = (s + m * p) / (n + m)
        else:
            n, s = stats[c]
            exp = (s - y + m * p) / (n - 1 + m)
        assert abs(r["te"] - exp) < 1e-12, (c, y)
    # singleton under LOO == exactly the prior
    c_row = [r for r in got if r["c"] == "c"][0]
    assert abs(c_row["te"] - p) < 1e-12


def test_collapse_rare_categories(spark):
    rows = (
        [("big",)] * 12 + [("mid",)] * 10 + [("tiny",)] * 3 + [(None,)] * 2
    )
    df = spark.createDataFrame(rows, "c string")
    out = collapse_rare_categories(df, "c", min_count=10).collect()
    vals = [r["c"] for r in out]
    assert vals.count("big") == 12
    assert vals.count("mid") == 10
    assert vals.count("__other__") == 3
    assert vals.count(None) == 2
    # out_col variant keeps the original column
    out2 = collapse_rare_categories(
        df, "c", min_count=10, out_col="c2"
    ).collect()
    assert {r["c2"] for r in out2 if r["c"] == "tiny"} == {"__other__"}
    assert {r["c"] for r in out2 if r["c"] == "tiny"} == {"tiny"}


def test_target_encode_loo_unsmoothed_singleton_is_prior(spark):
    """ADVICE r8: loo=True with smoothing=0 hit a 0/0 for singleton
    categories and yielded NULL; the documented semantics is the
    prior fallback."""
    df = spark.createDataFrame(ROWS, "c string, y double")
    got = target_encode(
        df, "c", "y", smoothing=0.0, loo=True, round_digits=None
    ).collect()
    p = _prior()
    c_row = [r for r in got if r["c"] == "c"][0]
    assert c_row["te"] is not None
    assert abs(c_row["te"] - p) < 1e-12
    # non-singletons still get the exact unsmoothed LOO code
    a30 = [r for r in got if r["c"] == "a" and r["y"] == 30.0][0]
    assert abs(a30["te"] - (10.0 + 20.0) / 2.0) < 1e-12
