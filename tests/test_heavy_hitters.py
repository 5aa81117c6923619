"""Misra–Gries heavy hitters (operators/sketches.py): the two-pass
plan must return EXACTLY the strict-threshold GROUP BY answer, and
the candidate phase must be a superset of every true heavy hitter
under any partitioning — the 100 TB load-bearing guarantee."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _exact_hh(values, k):
    n = len(values)
    return {
        v: c for v, c in Counter(values).items() if c * (k + 1) > n
    }


def _skewed_values(rng, n):
    vals = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            vals.append("alpha")
        elif r < 0.45:
            vals.append("beta")
        elif r < 0.52:
            vals.append("gamma")
        else:
            vals.append(f"tail{rng.randrange(500)}")
    return vals


@pytest.mark.parametrize("k", [2, 5, 20])
def test_heavy_hitters_exact_vs_counter(spark, k):
    from duckdb_imputation_spark.operators.sketches import heavy_hitters

    rng = random.Random(7 + k)
    vals = _skewed_values(rng, 4000)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["value"]: r["cnt"]
        for r in heavy_hitters(df, "v", k).collect()
    }
    assert got == _exact_hh(vals, k)


@pytest.mark.parametrize("nparts", [1, 3, 17])
def test_candidates_superset_under_any_partitioning(spark, nparts):
    from duckdb_imputation_spark.operators.sketches import (
        misra_gries_candidates,
    )

    rng = random.Random(31 + nparts)
    vals = _skewed_values(rng, 3000)
    k = 4
    df = spark.createDataFrame([(v,) for v in vals], "v string").repartition(
        nparts
    )
    cand = {r["v"] for r in misra_gries_candidates(df, "v", k).collect()}
    for v in _exact_hh(vals, k):
        assert v in cand, f"true heavy hitter {v} missing from candidates"


def test_heavy_hitters_nulls_and_result_when_uniform(spark):
    from duckdb_imputation_spark.operators.sketches import heavy_hitters

    rows = [(f"u{i}",) for i in range(100)] + [(None,)] * 50
    df = spark.createDataFrame(rows, "v string")
    # uniform data: nothing exceeds N/(k+1) for k=3 (threshold 25)
    assert heavy_hitters(df, "v", 3).count() == 0
    # one value pushed past the threshold; NULLs neither count toward
    # N nor appear as values
    rows2 = rows + [("big",)] * 60
    df2 = spark.createDataFrame(rows2, "v string")
    got = {
        r["value"]: r["cnt"] for r in heavy_hitters(df2, "v", 3).collect()
    }
    assert got == {"big": 60}  # N=160, threshold 40 < 60


def test_heavy_hitters_rejects_bad_k(spark):
    from duckdb_imputation_spark.operators.sketches import (
        misra_gries_candidates,
    )

    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="k must be"):
        misra_gries_candidates(df, "v", 0)


# ------------------------------------------------------------------ #
# grouped bottom-k (lives with the sketch tests)                      #
# ------------------------------------------------------------------ #


def test_bottomk_grouped_equals_per_group_global(spark):
    """Each group's sample must equal the global bottomk_sample run on
    that group alone — same permutation, same rows."""
    from duckdb_imputation_spark.operators.sketches import (
        bottomk_sample,
        bottomk_sample_grouped,
    )

    rows = [(f"d{i}", f"g{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, "id string, grp string")
    grouped = bottomk_sample_grouped(df, "id", 7, ["grp"])
    got = {
        g: {(r["id"], r["__bk_hash"]) for r in grouped.where(
            F.col("grp") == g).collect()}
        for g in ("g0", "g1", "g2")
    }
    for g in got:
        solo = {
            (r["id"], r["__bk_hash"])
            for r in bottomk_sample(
                df.where(F.col("grp") == g), "id", 7
            ).collect()
        }
        assert got[g] == solo
        assert len(got[g]) == 7


def test_bottomk_grouped_merge_law(spark):
    """Re-sampling the union of two batch samples equals sampling the
    concatenated input — per group."""
    from duckdb_imputation_spark.operators.sketches import (
        bottomk_sample_grouped,
    )

    rows = [(f"d{i}", f"g{i % 2}") for i in range(100)]
    df = spark.createDataFrame(rows, "id string, grp string")
    a = bottomk_sample_grouped(df.where("id < 'd5'"), "id", 5, ["grp"])
    b = bottomk_sample_grouped(df.where("id >= 'd5'"), "id", 5, ["grp"])
    merged = bottomk_sample_grouped(
        a.unionByName(b).drop("__bk_hash"), "id", 5, ["grp"]
    )
    direct = bottomk_sample_grouped(df, "id", 5, ["grp"])
    key = lambda d: {  # noqa: E731
        (r["grp"], r["id"]) for r in d.collect()
    }
    assert key(merged) == key(direct)


def test_bottomk_grouped_rejects_empty_groups_arg(spark):
    import pytest as _pytest

    from duckdb_imputation_spark.operators.sketches import (
        bottomk_sample_grouped,
    )

    df = spark.createDataFrame([("a", "g")], "id string, grp string")
    with _pytest.raises(ValueError, match="by_cols"):
        bottomk_sample_grouped(df, "id", 3, [])


# ------------------------------------------------------------------ #
# grouped heavy hitters                                                #
# ------------------------------------------------------------------ #

def test_grouped_heavy_hitters_exact_vs_naive(spark):
    """Per-group result equals the naive GROUP BY ... HAVING with the
    per-group threshold — on a fixture where the heavy value differs
    per group and one group has none."""
    import random

    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.sketches import (
        heavy_hitters_grouped,
    )

    rng = random.Random(7)
    rows = []
    rows += [("a", "hot") for _ in range(60)]
    rows += [("a", f"x{i}") for i in range(40)]            # a: hot=60/100
    rows += [("b", "warm") for _ in range(35)]
    rows += [("b", f"y{rng.randrange(50)}") for _ in range(65)]  # b: warm
    rows += [("c", f"z{i}") for i in range(50)]            # c: all unique
    rows += [(None, "hot")] * 5 + [("a", None)] * 5        # excluded
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r["g"], r["value"]): r["cnt"]
        for r in heavy_hitters_grouped(df, "v", ["g"], k=3).collect()
    }
    # naive reference
    from collections import Counter
    per_group: dict = {}
    for g, v in rows:
        if g is None or v is None:
            continue
        per_group.setdefault(g, Counter())[v] += 1
    want = {
        (g, v): c
        for g, ctr in per_group.items()
        for v, c in ctr.items()
        if c * 4 > sum(ctr.values())
    }
    assert got == want
    assert ("a", "hot") in got and ("b", "warm") in got
    assert not any(g == "c" for g, _ in got)


def test_grouped_heavy_hitters_multi_key_and_int_groups(spark):
    from duckdb_imputation_spark.operators.sketches import (
        heavy_hitters_grouped,
    )

    rows = [(1, "eu", "t") for _ in range(9)] + [(1, "eu", "u")] + [
        (2, "eu", "t")
    ]
    df = spark.createDataFrame(rows, "d int, r string, v string")
    got = {
        (r["d"], r["r"], r["value"]): r["cnt"]
        for r in heavy_hitters_grouped(df, "v", ["d", "r"], k=1).collect()
    }
    # group (1, eu): t=9/10 > 1/2; group (2, eu): t=1/1 > 1/2
    assert got == {(1, "eu", "t"): 9, (2, "eu", "t"): 1}
    # original int type preserved on the group column
    assert all(isinstance(k[0], int) for k in got)
