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


# ---------------------------------------------------------------------------
# Rank-based family (Spearman / Mann-Whitney / KS) + one-way ANOVA
# ---------------------------------------------------------------------------

from duckdb_imputation_spark.operators.stats import (  # noqa: E402
    anova_oneway,
    ks_2sample,
    mann_whitney_u,
    spearman_corr,
)


def _avg_ranks(vals):
    """Average ranks (1-based) with ties, per the textbook definition."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1 .. j
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def _py_spearman(xs, ys):
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = sum((a - mx) ** 2 for a in rx)
    dy = sum((b - my) ** 2 for b in ry)
    return num / math.sqrt(dx * dy)


def test_spearman_matches_python_reference(spark):
    rng = random.Random(7)
    rows = []
    for h in range(2):
        for _ in range(60):
            x = rng.randrange(0, 20)  # deliberate heavy ties
            y = 2 * x + rng.randrange(0, 15)
            rows.append((h, x, y))
    df = spark.createDataFrame(rows, "h int, x int, y int")
    out = {
        r["h"]: r
        for r in spearman_corr(df, "x", "y", by_cols=["h"]).collect()
    }
    for h in range(2):
        xs = [x for hh, x, _ in rows if hh == h]
        ys = [y for hh, _, y in rows if hh == h]
        ref = _py_spearman(xs, ys)
        assert out[h]["n"] == len(xs)
        assert abs(out[h]["rho"] - ref) < 2e-4, (h, out[h]["rho"], ref)


def test_spearman_degenerate(spark):
    # constant x -> zero rank variance -> NULL rho; n = 1 -> NULL
    df = spark.createDataFrame(
        [(1, 5, 1), (1, 5, 2), (1, 5, 3), (2, 9, 4)],
        "h int, x int, y int",
    )
    out = {r["h"]: r for r in
           spearman_corr(df, "x", "y", by_cols=["h"]).collect()}
    assert out[1]["rho"] is None
    assert out[2]["rho"] is None and out[2]["n"] == 1


def test_spearman_perfect_monotone(spark):
    df = spark.createDataFrame(
        [(i, i * i) for i in range(1, 30)], "x int, y int"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r["rho"] == 1.0


def _py_mwu(xs, ys):
    both = xs + ys
    ranks = _avg_ranks(both)
    ra = sum(ranks[: len(xs)])
    na, nb = len(xs), len(ys)
    u = ra - na * (na + 1) / 2.0
    n = na + nb
    from collections import Counter
    ties = sum(t**3 - t for t in Counter(both).values())
    var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2.0) / math.sqrt(var)
    return u, z


def test_mann_whitney_matches_python_reference(spark):
    rng = random.Random(23)
    rows = []
    for h in range(2):
        for _ in range(50):
            rows.append((h, "a", rng.randrange(0, 40)))
        for _ in range(35):
            rows.append((h, "b", rng.randrange(10, 50)))
        rows.append((h, "zz", 10_000))  # out-of-cohort: ignored
    df = spark.createDataFrame(rows, "h int, g string, v int")
    out = {
        r["h"]: r
        for r in mann_whitney_u(
            df, "g", "v", "a", "b", by_cols=["h"]
        ).collect()
    }
    for h in range(2):
        xs = [v for hh, g, v in rows if hh == h and g == "a"]
        ys = [v for hh, g, v in rows if hh == h and g == "b"]
        u, z = _py_mwu(xs, ys)
        r = out[h]
        assert (r["n_a"], r["n_b"]) == (len(xs), len(ys))
        assert abs(r["u_stat"] - u) < 1e-9, (h, r["u_stat"], u)
        assert abs(r["z_stat"] - z) < 2e-4, (h, r["z_stat"], z)


def test_mann_whitney_degenerate(spark):
    # empty cohort b -> NULL z; all-identical values -> zero variance
    df = spark.createDataFrame(
        [("a", 1), ("a", 2)], "g string, v int"
    )
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert r["n_b"] == 0 and r["z_stat"] is None
    df2 = spark.createDataFrame(
        [("a", 7)] * 3 + [("b", 7)] * 3, "g string, v int"
    )
    r2 = mann_whitney_u(df2, "g", "v", "a", "b").collect()[0]
    assert r2["z_stat"] is None and r2["u_stat"] == 4.5  # na*nb/2


def _py_ks(xs, ys):
    vals = sorted(set(xs + ys))
    na, nb = len(xs), len(ys)
    best = 0.0
    for v in vals:
        fa = sum(1 for x in xs if x <= v) / na
        fb = sum(1 for y in ys if y <= v) / nb
        best = max(best, abs(fa - fb))
    return best


def test_ks_matches_python_reference(spark):
    rng = random.Random(41)
    rows = []
    for _ in range(80):
        rows.append(("a", rng.randrange(0, 30)))
    for _ in range(55):
        rows.append(("b", rng.randrange(5, 40)))
    df = spark.createDataFrame(rows, "g string, v int")
    r = ks_2sample(df, "g", "v", "a", "b", round_digits=None).collect()[0]
    xs = [v for g, v in rows if g == "a"]
    ys = [v for g, v in rows if g == "b"]
    assert (r["n_a"], r["n_b"]) == (len(xs), len(ys))
    assert abs(r["d_stat"] - _py_ks(xs, ys)) < 1e-12


def test_ks_identical_and_disjoint(spark):
    same = [("a", i % 5) for i in range(20)] + [
        ("b", i % 5) for i in range(20)
    ]
    r = ks_2sample(
        spark.createDataFrame(same, "g string, v int"), "g", "v", "a", "b"
    ).collect()[0]
    assert r["d_stat"] == 0.0
    disj = [("a", i) for i in range(10)] + [("b", 100 + i) for i in range(7)]
    r2 = ks_2sample(
        spark.createDataFrame(disj, "g string, v int"), "g", "v", "a", "b"
    ).collect()[0]
    assert r2["d_stat"] == 1.0


def _py_anova(groups):
    k = len(groups)
    n = sum(len(g) for g in groups)
    grand = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum(
        sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups
    )
    return ssb, ssw, (ssb / (k - 1)) / (ssw / (n - k))


def test_anova_matches_python_reference(spark):
    rng = random.Random(5)
    rows = []
    for h in range(2):
        for gi, mean in enumerate((100, 120, 150)):
            for _ in range(30 + 5 * gi):
                rows.append((h, f"g{gi}", mean + rng.randrange(-20, 20)))
    df = spark.createDataFrame(rows, "h int, g string, v int")
    out = {
        r["h"]: r
        for r in anova_oneway(df, "g", "v", by_cols=["h"]).collect()
    }
    for h in range(2):
        groups = [
            [float(v) for hh, g, v in rows if hh == h and g == f"g{gi}"]
            for gi in range(3)
        ]
        ssb, ssw, f = _py_anova(groups)
        r = out[h]
        assert r["k_groups"] == 3 and r["n"] == sum(map(len, groups))
        assert abs(r["ss_between"] - ssb) < 1e-3
        assert abs(r["ss_within"] - ssw) < 1e-3
        assert abs(r["f_stat"] - f) < 2e-4


def test_anova_degenerate(spark):
    # single level -> NULL; zero within-variance -> NULL
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    assert anova_oneway(df, "g", "v").collect()[0]["f_stat"] is None
    df2 = spark.createDataFrame(
        [("a", 5.0)] * 3 + [("b", 9.0)] * 3, "g string, v double"
    )
    assert anova_oneway(df2, "g", "v").collect()[0]["f_stat"] is None


# ------------------------------------------------- Benford profile

def test_benford_matches_python_reference(spark):
    from duckdb_imputation_spark.operators.stats import benford_profile

    rng = random.Random(17)
    # multi-scale magnitudes: Benford-ish (product of uniforms)
    rows = []
    for h in range(2):
        for _ in range(120):
            rows.append(
                (h, int(rng.randrange(1, 10) * 10 ** rng.randrange(0, 5)))
            )
        rows.append((h, 0))   # excluded
        rows.append((h, -5))  # excluded
    df = spark.createDataFrame(rows, "h int, v long")
    out = {}
    for r in benford_profile(
        df, "v", by_cols=["h"], round_digits=None
    ).collect():
        out.setdefault(r["h"], {})[r["digit"]] = r
    for h in range(2):
        vals = [v for hh, v in rows if hh == h and v > 0]
        n = len(vals)
        cnt = {}
        for x in vals:
            d = int(str(x)[0])
            cnt[d] = cnt.get(d, 0) + 1
        chi = sum(
            (cnt.get(d, 0) - n * math.log10(1 + 1 / d)) ** 2
            / (n * math.log10(1 + 1 / d))
            for d in range(1, 10)
        )
        got = out[h]
        assert set(got) == set(cnt)
        for d, c in cnt.items():
            r = got[d]
            assert r["cnt"] == c
            assert abs(r["obs_p"] - c / n) < 1e-12
            assert abs(r["expected_p"] - math.log10(1 + 1 / d)) < 1e-12
            assert abs(r["chi2"] - chi) < 1e-9, (h, r["chi2"], chi)


def test_benford_unobserved_digit_closure(spark):
    from duckdb_imputation_spark.operators.stats import benford_profile

    # only digits 1 and 2 observed: the 7 unobserved digits' E terms
    # must still be in chi2 (the closure), and no rows for them
    df = spark.createDataFrame(
        [(10,)] * 30 + [(25,)] * 10, "v long"
    )
    rows = benford_profile(df, "v", round_digits=None).collect()
    assert {r["digit"] for r in rows} == {1, 2}
    n = 40
    chi = sum(
        ((30 if d == 1 else 10 if d == 2 else 0)
         - n * math.log10(1 + 1 / d)) ** 2
        / (n * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    assert abs(rows[0]["chi2"] - chi) < 1e-9


def test_chi2_effect_size_cramers_v(spark):
    from duckdb_imputation_spark.operators.stats import chi2_independence

    rows = []
    # strong association: a determines b
    for i in range(60):
        rows.append((f"a{i % 3}", f"b{i % 3}"))
    df = spark.createDataFrame(rows, "x string, y string")
    r = chi2_independence(df, "x", "y", effect_size=True).collect()[0]
    # perfect association in a 3x3 table: V == 1
    assert abs(r["cramers_v"] - 1.0) < 1e-9
    v_manual = math.sqrt(r["chi2"] / (r["n"] * (3 - 1)))
    assert abs(r["cramers_v"] - round(v_manual, 4)) < 1e-9
    # single-level categorical: V undefined
    df2 = spark.createDataFrame(
        [("only", f"b{i % 2}") for i in range(10)], "x string, y string"
    )
    r2 = chi2_independence(df2, "x", "y", effect_size=True).collect()[0]
    assert r2["cramers_v"] is None
    # default path unchanged: no cramers_v column
    r3 = chi2_independence(df, "x", "y").collect()[0]
    assert "cramers_v" not in r3.asDict()


def test_categorical_entropy_matches_python_reference(spark):
    from duckdb_imputation_spark.operators.stats import categorical_entropy

    rng = random.Random(29)
    rows = []
    for h in range(2):
        for _ in range(100):
            rows.append((h, f"c{rng.randrange(0, 4 + h)}"))
        rows.append((h, None))  # dropped
    df = spark.createDataFrame(rows, "h int, c string")
    out = {
        r["h"]: r
        for r in categorical_entropy(
            df, "c", by_cols=["h"], round_digits=None
        ).collect()
    }
    for h in range(2):
        vals = [c for hh, c in rows if hh == h and c is not None]
        n = len(vals)
        from collections import Counter
        cnt = Counter(vals)
        ent = -sum((c / n) * math.log(c / n) for c in cnt.values())
        r = out[h]
        assert (r["n"], r["k_levels"]) == (n, len(cnt))
        assert abs(r["entropy"] - ent) < 1e-12
        assert abs(r["entropy_norm"] - ent / math.log(len(cnt))) < 1e-12


def test_categorical_entropy_degenerate(spark):
    from duckdb_imputation_spark.operators.stats import categorical_entropy

    # single level: H = 0, H_norm undefined; uniform: H_norm = 1
    df = spark.createDataFrame([("a",)] * 7, "c string")
    r = categorical_entropy(df, "c").collect()[0]
    assert r["entropy"] == 0.0 and r["entropy_norm"] is None
    df2 = spark.createDataFrame(
        [(f"c{i % 5}",) for i in range(50)], "c string"
    )
    r2 = categorical_entropy(df2, "c").collect()[0]
    assert abs(r2["entropy_norm"] - 1.0) < 1e-9


def test_benford_rejects_fractional_column(spark):
    """ADVICE r8: a double value column fails loudly instead of
    letting 0.53 extract digit 0 and poison expected_p with inf."""
    import pytest

    from duckdb_imputation_spark.operators.stats import benford_profile

    df = spark.createDataFrame([(0.53,), (123.0,)], "v double")
    with pytest.raises(ValueError, match="integral"):
        benford_profile(df, "v")
    # integral types (and decimal(x,0)) still pass
    ok = spark.createDataFrame([(153,), (27,)], "v long")
    assert len(benford_profile(ok, "v").collect()) == 2


def test_cohort_dictionary_with_ranks_flag(spark):
    """ADVICE r8: KS only needs per-value cohort counts; the
    with_ranks=False path must omit __r2 (and its window sort)
    while leaving counts identical."""
    from duckdb_imputation_spark.operators.stats import _cohort_dictionary

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    slim = _cohort_dictionary(df, "g", "v", "a", "b", [], with_ranks=False)
    assert "__r2" not in slim.columns
    full = _cohort_dictionary(df, "g", "v", "a", "b", [])
    assert "__r2" in full.columns
    a = {(r["__v"], r["__ca"], r["__cb"]) for r in slim.collect()}
    b = {(r["__v"], r["__ca"], r["__cb"]) for r in full.collect()}
    assert a == b
    # the slim plan carries no Window node at all
    assert "Window" not in slim._jdf.queryExecution().optimizedPlan().toString()


# --------------------------------------------------------------------- #
# auc_score                                                             #
# --------------------------------------------------------------------- #


def _auc_brute(scores_pos, scores_neg):
    """Pairwise trapezoidal AUC: P(s_pos > s_neg) + 0.5 P(=)."""
    wins = ties = 0
    for p in scores_pos:
        for n in scores_neg:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    return (wins + 0.5 * ties) / (len(scores_pos) * len(scores_neg))


def test_auc_matches_pairwise_bruteforce(spark):
    """Rank-sum AUC equals the O(n^2) pairwise definition, ties
    included (Hanley-McNeil identity)."""
    from duckdb_imputation_spark.operators.stats import auc_score

    pos = [3.0, 5.0, 5.0, 9.0, 2.0]
    neg = [1.0, 5.0, 4.0, 2.0]
    rows = [(1, s) for s in pos] + [(0, s) for s in neg]
    df = spark.createDataFrame(rows, "y int, s double")
    got = auc_score(df, "y", "s", round_digits=None).collect()[0]
    assert got["n_pos"] == 5 and got["n_neg"] == 4
    assert abs(got["auc"] - _auc_brute(pos, neg)) < 1e-12


def test_auc_seeded_random_vs_bruteforce(spark):
    """Seeded random scores with heavy ties, per-stratum."""
    import numpy as np

    from duckdb_imputation_spark.operators.stats import auc_score

    rng = np.random.default_rng(7)
    rows = []
    truth = {}
    for g in ["u", "v"]:
        y = rng.integers(0, 2, 80)
        s = rng.integers(0, 12, 80).astype(float)  # heavy ties
        rows += [(g, int(yy), float(ss)) for yy, ss in zip(y, s)]
        truth[g] = _auc_brute(s[y == 1], s[y == 0])
    df = spark.createDataFrame(rows, "g string, y int, s double")
    out = {
        r["g"]: r["auc"]
        for r in auc_score(
            df, "y", "s", by_cols=["g"], round_digits=None
        ).collect()
    }
    for g in truth:
        assert abs(out[g] - truth[g]) < 1e-12, g


def test_auc_degenerate_classes_null(spark):
    """A stratum with only one class present gets a NULL auc."""
    from duckdb_imputation_spark.operators.stats import auc_score

    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 1, 3.0), ("b", 1, 1.0), ("b", 0, 4.0)],
        "g string, y int, s double",
    )
    out = {r["g"]: r for r in auc_score(df, "y", "s", by_cols=["g"]).collect()}
    assert out["a"]["auc"] is None and out["a"]["n_neg"] == 0
    assert out["b"]["auc"] == 0.0  # the one pos scores below the one neg


def test_auc_perfect_and_inverted(spark):
    from duckdb_imputation_spark.operators.stats import auc_score

    df = spark.createDataFrame(
        [(1, 10.0), (1, 9.0), (0, 1.0), (0, 2.0)], "y int, s double"
    )
    assert auc_score(df, "y", "s").collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (0, 10.0), (0, 9.0)], "y int, s double"
    )
    assert auc_score(inv, "y", "s").collect()[0]["auc"] == 0.0


def test_auc_ovr_matches_per_class_bruteforce(spark):
    """auc_ovr = the binary pairwise AUC of each class's own score
    ranking class-vs-rest (seeded, heavy ties, three classes)."""
    import numpy as np

    from duckdb_imputation_spark.operators.stats import auc_ovr

    rng = np.random.default_rng(11)
    n = 120
    labels = rng.choice(["a", "b", "c"], n)
    s_a = rng.integers(0, 10, n).astype(float)
    s_b = rng.integers(0, 10, n).astype(float)
    s_c = rng.integers(0, 10, n).astype(float)
    rows = [
        (str(l), float(x), float(y), float(z))
        for l, x, y, z in zip(labels, s_a, s_b, s_c)
    ]
    df = spark.createDataFrame(rows, "lab string, sa double, sb double, sc double")
    out = {
        r["class"]: r
        for r in auc_ovr(
            df,
            "lab",
            [("a", "sa"), ("b", "sb"), ("c", "sc")],
            round_digits=None,
        ).collect()
    }
    for cls, s in [("a", s_a), ("b", s_b), ("c", s_c)]:
        pos = s[labels == cls]
        neg = s[labels != cls]
        assert out[cls]["n_pos"] == len(pos) and out[cls]["n_neg"] == len(neg)
        assert abs(out[cls]["auc"] - _auc_brute(pos, neg)) < 1e-12, cls


def test_auc_ovr_null_labels_and_missing_class(spark):
    """NULL labels drop everywhere; a declared class absent from the
    data gets n_pos 0 and a NULL auc."""
    from duckdb_imputation_spark.operators.stats import auc_ovr

    df = spark.createDataFrame(
        [("a", 3.0), ("b", 1.0), (None, 9.0), ("a", 2.0)],
        "lab string, s double",
    )
    out = {
        r["class"]: r
        for r in auc_ovr(df, "lab", [("a", "s"), ("z", "s")]).collect()
    }
    assert out["a"]["n_pos"] == 2 and out["a"]["n_neg"] == 1
    assert out["z"]["n_pos"] == 0 and out["z"]["auc"] is None
