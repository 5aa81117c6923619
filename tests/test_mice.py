"""MICE end-to-end: inject missingness into correlated data, impute, and
check the recovered values beat mean-filling (the reference's iris demo,
main.cpp:40-81, with a synthetic stand-in)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_imputation_spark.mice import mice_impute

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def missing_df(spark):
    """Correlated data: y ≈ 2x + cat effect; 20% of y and cat nulled."""
    n = 1500
    x = RNG.normal(0, 1, n)
    cat = RNG.integers(0, 3, n)
    y = 2.0 * x + cat * 3.0 + RNG.normal(0, 0.2, n)
    z = -x + 0.5 * y + RNG.normal(0, 0.2, n)
    miss_y = RNG.random(n) < 0.2
    miss_cat = RNG.random(n) < 0.2
    rows = [
        (
            int(i),
            float(x[i]),
            None if miss_y[i] else float(y[i]),
            float(z[i]),
            None if miss_cat[i] else int(cat[i]),
            float(y[i]),
            int(cat[i]),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, x double, y double, z double, cat int, y_true double, cat_true int"
    )
    return df


@pytest.mark.parametrize("strategy", ["baseline", "low", "high"])
def test_mice_recovers_values(missing_df, strategy):
    df = missing_df
    res = mice_impute(
        df.select("id", "x", "y", "z", "cat"),
        cont_cols=["x", "y", "z"],
        cat_cols=["cat"],
        cont_nulls=["y"],
        cat_nulls=["cat"],
        iters=2,
        strategy=strategy,
        noise=False,
    )
    out = res.df.join(df.select("id", "y_true", "cat_true", F.col("y").alias("y_orig"), F.col("cat").alias("cat_orig")), "id")
    scored = out.filter(F.col("y_orig").isNull()).select(
        F.sqrt(F.avg((F.col("y") - F.col("y_true")) ** 2)).alias("rmse"),
        F.stddev("y_true").alias("sd"),
    ).collect()[0]
    assert scored["rmse"] < 0.5 * scored["sd"], (
        f"{strategy}: rmse {scored['rmse']} vs sd {scored['sd']}"
    )
    acc = out.filter(F.col("cat_orig").isNull()).select(
        F.avg((F.col("cat") == F.col("cat_true")).cast("double")).alias("acc")
    ).collect()[0]["acc"]
    assert acc > 0.6, f"{strategy}: cat accuracy {acc}"
    # observed entries must be untouched
    kept = out.filter(F.col("y_orig").isNotNull()).select(
        F.max(F.abs(F.col("y") - F.col("y_orig"))).alias("d")
    ).collect()[0]["d"]
    assert kept == 0.0


def test_mice_stochastic_reproducible(missing_df):
    df = missing_df.select("id", "x", "y", "z", "cat")
    kw = dict(
        cont_cols=["x", "y", "z"],
        cat_cols=["cat"],
        cont_nulls=["y"],
        cat_nulls=[],
        iters=1,
        strategy="baseline",
        noise=True,
        seed=99,
    )
    a = mice_impute(df, **kw).df.orderBy("id").select("y").collect()
    b = mice_impute(df, **kw).df.orderBy("id").select("y").collect()
    assert [r["y"] for r in a] == [r["y"] for r in b]
