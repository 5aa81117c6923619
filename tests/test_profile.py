"""profile_table (operators/profile.py): the SUMMARIZE surface must be
exact, one-pass, and NULL-correct."""

import pytest
from pyspark.sql import functions as F


def _profile_map(df, cols=None):
    from duckdb_imputation_spark.operators.profile import profile_table

    return {
        r["column"]: r.asDict() for r in profile_table(df, cols).collect()
    }


def test_profile_numeric_and_string_columns(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (3.0, "b"), (None, None)],
        "x double, s string",
    )
    p = _profile_map(df)
    x = p["x"]
    assert (x["count"], x["n_null"], x["n_distinct"]) == (3, 1, 3)
    assert (x["min_value"], x["max_value"]) == ("1.0", "3.0")
    assert x["mean"] == pytest.approx(2.0)
    # population std of {1,2,3}
    assert x["std"] == pytest.approx((2.0 / 3.0) ** 0.5)
    # exact linear-interpolation quartiles of {1,2,3}
    assert (x["q25"], x["q50"], x["q75"]) == (1.5, 2.0, 2.5)
    s = p["s"]
    assert (s["count"], s["n_null"], s["n_distinct"]) == (3, 1, 2)
    assert (s["min_value"], s["max_value"]) == ("a", "b")
    assert s["mean"] is None and s["std"] is None and s["q50"] is None


def test_profile_is_one_pass(spark):
    """One scan, zero joins, regardless of column count — in BOTH
    distinct modes (count only the AQE Final Plan section: the
    executedPlan string also prints the Initial Plan, which
    double-counts every node)."""
    from duckdb_imputation_spark.operators.profile import profile_table

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag"]
    for exact in (True, False):
        prof = profile_table(df, cols, exact_distinct=exact)
        prof.collect()
        plan = prof._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Scan parquet") == 1
        assert final.count("Join") == 0


def test_profile_column_subset_and_order(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    from duckdb_imputation_spark.operators.profile import profile_table

    out = profile_table(df, ["b", "a"]).select("column").collect()
    assert [r["column"] for r in out] == ["b", "a"]


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "x double, s string")
    p = _profile_map(df)
    assert p["x"]["count"] == 0
    assert p["x"]["n_distinct"] == 0
    assert p["x"]["min_value"] is None
    assert p["x"]["q50"] is None
