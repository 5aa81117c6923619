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


def test_profile_approx_quantiles_mode(spark):
    """exact_quantiles=False (VERDICT r7 #2) swaps percentile for the
    bounded-memory approx_percentile sketch: still ONE scan / zero
    joins, quartiles land within the sketch's rank error (exact on
    this tiny input), and the exact default is untouched."""
    from duckdb_imputation_spark.operators.profile import profile_table

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]
    approx = profile_table(df, cols, exact_quantiles=False)
    approx.collect()
    plan = approx._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert final.count("Join") == 0
    assert "approx_percentile" in final
    ex = {r["column"]: r.asDict() for r in
          profile_table(df, cols).collect()}
    ap = {r["column"]: r.asDict() for r in approx.collect()}
    for c in cols:
        # l_quantity is integers 1..50: the default-accuracy sketch is
        # rank-exact there; price quartiles must sit within 1% of exact
        for q in ("q25", "q50", "q75"):
            assert ap[c][q] == pytest.approx(ex[c][q], rel=0.01)
        # non-quantile stats identical in both modes
        assert ap[c]["count"] == ex[c]["count"]
        assert ap[c]["mean"] == pytest.approx(ex[c]["mean"])


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


# ------------------------------------------------------------------ #
# grouped_robust_stats                                                #
# ------------------------------------------------------------------ #

def _robust(spark, rows, **kw):
    from duckdb_imputation_spark.operators.profile import (
        grouped_robust_stats,
    )

    df = spark.createDataFrame(rows, "g string, x double")
    out = grouped_robust_stats(df, "x", ["g"], **kw)
    return {r["g"]: r.asDict() for r in out.collect()}


def test_robust_stats_hand_computed(spark):
    # g=a: {1, 2, 3, 4, 100}: med=3? no — even handling: 5 values,
    # med=3; |x-med| = {2,1,0,1,97}, MAD=1; threshold 3*1.4826*1
    # = 4.4478 -> only 97 exceeds -> 1 outlier.
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0)]
    got = _robust(spark, rows)["a"]
    assert got["n"] == 5
    assert got["med"] == 3.0
    assert got["mad"] == 1.0
    assert got["n_outliers"] == 1


def test_robust_stats_interpolated_median(spark):
    # 4 values -> median is the midpoint of the middle two
    rows = [("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 8.0)]
    got = _robust(spark, rows)["a"]
    assert got["med"] == 3.0
    # deviations {2,1,1,5} -> sorted {1,1,2,5}, median = 1.5
    assert got["mad"] == 1.5


def test_robust_stats_constant_group_and_python_reference(spark):
    import random
    import statistics

    rng = random.Random(11)
    rows = [("c", 7.0)] * 4 + [
        ("r", round(rng.gauss(0, 1), 3)) for _ in range(101)
    ]
    got = _robust(spark, rows)
    # constant group: MAD 0 -> nothing is > 0 away -> 0 outliers
    c = got["c"]
    assert (c["med"], c["mad"], c["n_outliers"]) == (7.0, 0.0, 0)
    # randomized group vs a pure-Python twin (odd n: exact order stats)
    xs = sorted(x for g, x in rows if g == "r")
    med = statistics.median(xs)
    mad = statistics.median(sorted(abs(x - med) for x in xs))
    n_out = sum(1 for x in xs if abs(x - med) > (3.0 * 1.4826) * mad)
    r = got["r"]
    assert r["med"] == med
    assert r["mad"] == mad
    assert r["n_outliers"] == n_out


def test_robust_stats_approx_mode_runs(spark):
    rows = [("a", float(i)) for i in range(50)]
    got = _robust(spark, rows, exact=False)["a"]
    assert got["n"] == 50 and got["mad"] >= 0.0


# ------------------------------------------------------------------ #
# grouped_winsorize                                                   #
# ------------------------------------------------------------------ #

def _wins(spark, rows, **kw):
    from duckdb_imputation_spark.operators.profile import grouped_winsorize

    df = spark.createDataFrame(rows, "g string, x double")
    out = grouped_winsorize(df, "x", ["g"], **kw)
    return out


def test_winsorize_hand_computed(spark):
    # {0..10} in one group; p10 = 1.0, p90 = 9.0 (exact interpolation
    # on 11 evenly spaced values)
    rows = [("a", float(i)) for i in range(11)]
    got = {
        r["x"]: r["x_wins"]
        for r in _wins(spark, rows, lower=0.1, upper=0.9).collect()
    }
    assert got[0.0] == 1.0 and got[10.0] == 9.0     # clipped
    assert got[1.0] == 1.0 and got[9.0] == 9.0      # at the cut
    assert all(got[float(i)] == float(i) for i in range(2, 9))


def test_winsorize_null_values_stay_null_and_groups_independent(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 100.0), ("a", None),
            ("b", 5.0), ("b", 6.0)]
    out = _wins(spark, rows, lower=0.0, upper=0.5).collect()
    by = {}
    for r in out:
        by.setdefault(r["g"], []).append((r["x"], r["x_wins"]))
    # group a: p50 of {1,2,100} = 2.0 -> 100 clips to 2, NULL stays NULL
    a = dict(by["a"])
    assert a[100.0] == 2.0 and a[1.0] == 1.0 and a[None] is None
    # group b has its own cuts: p50 of {5,6} = 5.5
    b = dict(by["b"])
    assert b[6.0] == 5.5 and b[5.0] == 5.0


def test_winsorize_matches_duckdb_quantile_cont(spark):
    import random

    import duckdb

    rng = random.Random(3)
    rows = [
        (f"g{rng.randrange(3)}", round(rng.gauss(0, 10), 4))
        for _ in range(300)
    ]
    got = {
        (r["g"], r["x"]): r["x_wins"]
        for r in _wins(spark, rows, lower=0.05, upper=0.95).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = con.execute("""
        WITH c AS (
          SELECT g, quantile_cont(x, 0.05) lo, quantile_cont(x, 0.95) hi
          FROM t GROUP BY g
        )
        SELECT t.g, t.x, LEAST(GREATEST(t.x, c.lo), c.hi)
        FROM t JOIN c USING (g)
    """).fetchall()
    for g, x, w in exp:
        assert got[(g, x)] == w


def test_robust_stats_via_sort_bit_identical(spark):
    import random

    from duckdb_imputation_spark.operators.profile import (
        grouped_robust_stats,
    )

    rng = random.Random(21)
    rows = []
    for g, n in (("a", 101), ("b", 64), ("c", 1), ("d", 2)):
        rows += [
            (g, None if rng.random() < 0.1 else round(rng.gauss(3, 7), 4))
            for _ in range(n)
        ]
    df = spark.createDataFrame(rows, "g string, x double")
    buf = {
        r["g"]: (r["n"], r["med"], r["mad"], r["n_outliers"])
        for r in grouped_robust_stats(df, "x", ["g"]).collect()
    }
    srt = {
        r["g"]: (r["n"], r["med"], r["mad"], r["n_outliers"])
        for r in grouped_robust_stats(
            df, "x", ["g"], via_sort=True
        ).collect()
    }
    # bit-identical, including even-count interpolated medians — the
    # sort path uses the same a + (b - a) * 0.5 interpolation
    assert srt == buf and set(buf) == {"a", "b", "c", "d"}


def test_robust_stats_via_sort_lint_clean(spark):
    from duckdb_imputation_spark.operators.profile import (
        grouped_robust_stats,
    )
    from duckdb_imputation_spark.plans import lint_plan

    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).select("l_returnflag", "l_extendedprice")
    out = grouped_robust_stats(
        li, "l_extendedprice", ["l_returnflag"], via_sort=True
    )
    out.collect()
    errs = [f for f in lint_plan(out) if f.severity == "error"]
    assert not errs, errs


# ------------------------------------------------------------------ #
# json_key_profile                                                    #
# ------------------------------------------------------------------ #

def test_json_key_profile_counts_types_and_dirty_rows(spark):
    from duckdb_imputation_spark.operators.profile import json_key_profile

    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2}',),
        ('{"a": 1, "c": true}',),
        ("not json at all",),   # malformed: contributes nothing
        (None,),                 # NULL row: contributes nothing
        ("{}",),                 # empty object: no keys
    ]
    df = spark.createDataFrame(rows, "j string")
    got = {
        r["key"]: (
            r["n_present"], r["n_distinct_values"],
            r["min_value"], r["max_value"],
        )
        for r in json_key_profile(df, "j").collect()
    }
    assert got == {
        "a": (3, 2, "1", "2"),
        "b": (1, 1, "x", "x"),
        "c": (1, 1, "true", "true"),
    }


def test_json_key_profile_approx_mode_and_plan(spark):
    """One scan + one keyed aggregate, both distinct modes; approx
    agrees exactly on a tiny key space."""
    from duckdb_imputation_spark.operators.profile import json_key_profile

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = json_key_profile(df, "props")
    exact.collect()
    plan = exact._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert final.count("Join") == 0
    assert "BatchEvalPython" not in final
    e = {r["key"]: r["n_present"] for r in exact.collect()}
    a = {
        r["key"]: r["n_present"]
        for r in json_key_profile(df, "props", exact_distinct=False).collect()
    }
    assert e == a and e  # events props has at least one key


# ------------------------------------------------- grouped moments

def test_grouped_moments_matches_python_reference(spark):
    import random

    from duckdb_imputation_spark.operators.profile import grouped_moments

    rng = random.Random(3)
    rows = []
    for h in range(2):
        for _ in range(80):
            # deliberately skewed: squared uniform
            rows.append((h, float(rng.randrange(0, 30) ** 2)))
    df = spark.createDataFrame(rows, "h int, v double")

    def ref(vals, sample):
        import math
        n = len(vals)
        mean = sum(vals) / n
        m2 = sum((x - mean) ** 2 for x in vals) / n
        m3 = sum((x - mean) ** 3 for x in vals) / n
        m4 = sum((x - mean) ** 4 for x in vals) / n
        if sample:
            var = m2 * n / (n - 1)
            skew = math.sqrt(n * (n - 1)) / (n - 2) * m3 / m2**1.5
            kurt = (n - 1) / ((n - 2) * (n - 3)) * (
                (n + 1) * (m4 / m2**2 - 3) + 6
            )
        else:
            var, skew, kurt = m2, m3 / m2**1.5, m4 / m2**2 - 3
        return mean, var, skew, kurt

    for sample in (False, True):
        out = {
            r["h"]: r
            for r in grouped_moments(
                df, "v", by_cols=["h"], sample=sample, round_digits=None
            ).collect()
        }
        for h in range(2):
            vals = [v for hh, v in rows if hh == h]
            mean, var, skew, kurt = ref(vals, sample)
            r = out[h]
            assert r["n"] == len(vals)
            assert abs(r["mean"] - mean) < 1e-9
            assert abs(r["variance"] - var) < 1e-6 * max(1, abs(var))
            assert abs(r["skewness"] - skew) < 1e-9, (sample, h)
            assert abs(r["kurtosis_excess"] - kurt) < 1e-9, (sample, h)


def test_grouped_moments_degenerate(spark):
    from duckdb_imputation_spark.operators.profile import grouped_moments

    # constant column -> zero variance -> NULL shape stats
    df = spark.createDataFrame([(1.0,)] * 5, "v double")
    r = grouped_moments(df, "v").collect()[0]
    assert r["variance"] == 0.0
    assert r["skewness"] is None and r["kurtosis_excess"] is None
    # tiny n for the corrected forms
    df2 = spark.createDataFrame([(1.0,), (2.0,), (4.0,)], "v double")
    r2 = grouped_moments(df2, "v", sample=True).collect()[0]
    assert r2["skewness"] is not None  # n=3 ok for G1
    assert r2["kurtosis_excess"] is None  # n<4 undefined


# ------------------------------------------------- quantile buckets

def test_quantile_buckets_matches_python_reference(spark):
    import random

    from duckdb_imputation_spark.operators.profile import quantile_buckets

    rng = random.Random(13)
    rows = []
    for h in range(2):
        for _ in range(97):  # awkward n: interpolated edges
            rows.append((h, float(rng.randrange(0, 1000))))
    rows.append((0, None))
    df = spark.createDataFrame(rows, "h int, v double")
    out = quantile_buckets(df, "v", n_buckets=4, by_cols=["h"]).collect()

    def edges_of(vals, n):
        # quantile_cont / Spark percentile: linear interpolation
        s = sorted(vals)
        es = []
        for i in range(1, n):
            q = i / n
            pos = q * (len(s) - 1)
            lo, hi = int(pos), min(int(pos) + 1, len(s) - 1)
            es.append(s[lo] + (pos - lo) * (s[hi] - s[lo]))
        return es

    per_h = {
        h: edges_of([v for hh, v in rows if hh == h and v is not None], 4)
        for h in range(2)
    }
    for r in out:
        if r["v"] is None:
            assert r["bucket"] is None
            continue
        exp = sum(r["v"] > e for e in per_h[r["h"]])
        assert r["bucket"] == exp, (r["h"], r["v"], r["bucket"], exp)
    # each stratum's buckets are roughly equal-frequency
    from collections import Counter
    c = Counter((r["h"], r["bucket"]) for r in out if r["v"] is not None)
    assert all(20 <= n <= 29 for n in c.values()), c


def test_quantile_buckets_approx_mode_runs(spark):
    from duckdb_imputation_spark.operators.profile import quantile_buckets

    df = spark.createDataFrame(
        [(float(i),) for i in range(1000)], "v double"
    )
    out = quantile_buckets(df, "v", n_buckets=10, exact=False).collect()
    assert {r["bucket"] for r in out} == set(range(10))


def test_quantile_buckets_row_preserving_null_strata(spark):
    """ADVICE r8: rows whose stratum has only NULL values, and rows
    with a NULL by-key, must survive with a NULL bucket (left join),
    not vanish (the old inner join)."""
    from duckdb_imputation_spark.operators.profile import quantile_buckets

    rows = (
        [(0, float(i)) for i in range(8)]  # normal stratum
        + [(1, None), (1, None)]           # all-NULL stratum: no edges
        + [(None, 5.0)]                    # NULL by-key: no stratum
    )
    df = spark.createDataFrame(rows, "h int, v double")
    out = quantile_buckets(df, "v", n_buckets=4, by_cols=["h"]).collect()
    assert len(out) == len(rows)  # row-preserving
    assert all(
        r["bucket"] is None for r in out if r["h"] != 0
    ), out
    assert all(r["bucket"] is not None for r in out if r["h"] == 0)


def test_quantile_buckets_row_preserving_all_null_global(spark):
    """No-keys case: an EMPTY edges frame (every value NULL) must not
    erase the corpus — the old crossJoin returned zero rows."""
    from duckdb_imputation_spark.operators.profile import quantile_buckets

    df = spark.createDataFrame([(None,), (None,), (None,)], "v double")
    out = quantile_buckets(df, "v", n_buckets=4).collect()
    assert len(out) == 3
    assert all(r["bucket"] is None for r in out)
