"""funnel_counts/funnel_users (strict-order earliest-completion
semantics on crafted journeys) and classification_report (confusion /
Brier / log-loss vs hand-computed NumPy)."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from duckdb_imputation_spark.ml.eval import classification_report
from duckdb_imputation_spark.operators.funnel import (
    funnel_counts,
    funnel_users,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, float(t), s) for u, t, s in rows],
        "u int, ts double, et string",
    )


def test_funnel_strict_order(spark):
    rows = [
        # u1: full ordered journey
        (1, 1.0, "view"), (1, 2.0, "click"), (1, 3.0, "buy"),
        # u2: clicked BEFORE viewing — click must not count
        (2, 2.0, "click"), (2, 3.0, "view"),
        # u3: view + buy but never clicked — stalls at stage 1
        (3, 1.0, "view"), (3, 2.0, "buy"),
        # u4: same-timestamp click (NOT strictly after) — stalls
        (4, 1.0, "view"), (4, 1.0, "click"),
        # u5: never viewed — not in the funnel at all
        (5, 1.0, "click"), (5, 2.0, "buy"),
    ]
    out = {
        r["stage"]: r
        for r in funnel_counts(
            _ev(spark, rows), "u", "ts", "et", ["view", "click", "buy"]
        ).collect()
    }
    assert out["view"]["n_users"] == 4
    assert out["click"]["n_users"] == 1
    assert out["buy"]["n_users"] == 1
    assert out["view"]["pm_of_first"] == 1000
    assert out["click"]["pm_of_first"] == 250
    assert [out[s]["stage_idx"] for s in ["view", "click", "buy"]] == [
        1, 2, 3,
    ]


def test_funnel_earliest_completion_greedy(spark):
    """Matching the EARLIEST qualifying event per stage is what makes
    u1 convert: the late second view must not re-anchor the journey."""
    rows = [
        (1, 1.0, "view"), (1, 5.0, "view"),
        (1, 2.0, "click"), (1, 3.0, "buy"),
    ]
    users = funnel_users(
        _ev(spark, rows), "u", "ts", "et", ["view", "click", "buy"]
    ).collect()
    assert len(users) == 1
    r = users[0]
    assert (r["t1"], r["t2"], r["t3"]) == (1.0, 2.0, 3.0)
    assert r["depth"] == 3


def test_funnel_within_window(spark):
    rows = [
        (1, 0.0, "view"), (1, 5.0, "click"),   # inside within=10
        (2, 0.0, "view"), (2, 50.0, "click"),  # outside
    ]
    out = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(
            _ev(spark, rows), "u", "ts", "et", ["view", "click"],
            within=10.0,
        ).collect()
    }
    assert out["view"] == 2 and out["click"] == 1


def test_funnel_single_stage_and_empty(spark):
    out = funnel_counts(
        _ev(spark, [(1, 1.0, "view")]), "u", "ts", "et", ["view"]
    ).collect()
    assert len(out) == 1 and out[0]["n_users"] == 1
    empty = funnel_counts(
        _ev(spark, [(1, 1.0, "other")]), "u", "ts", "et",
        ["view", "click"],
    ).collect()
    assert [r["n_users"] for r in empty] == [0, 0]
    assert all(r["pm_of_first"] is None for r in empty)


def test_classification_report_hand_computed(spark):
    # 6 rows, threshold 0.5 on milli grid
    data = [
        (1, 0.9),   # tp
        (1, 0.4),   # fn
        (0, 0.7),   # fp
        (0, 0.2),   # tn
        (0, 0.1),   # tn
        (1, 0.5),   # exactly at threshold -> positive -> tp
    ]
    df = spark.createDataFrame(data, "y int, p double")
    r = classification_report(df, "y", "p").collect()[0]
    assert (r["n"], r["tp"], r["fp"], r["tn"], r["fn"]) == (6, 2, 1, 2, 1)
    assert abs(r["accuracy"] - round(4 / 6, 6)) < 1e-12
    assert abs(r["precision"] - round(2 / 3, 6)) < 1e-12
    assert abs(r["recall"] - round(2 / 3, 6)) < 1e-12
    assert abs(r["f1"] - round(2 / 3, 6)) < 1e-12
    pm = np.array([900, 400, 700, 200, 100, 500])
    ym = np.array([1000, 1000, 0, 0, 0, 1000])
    brier = ((pm - ym) ** 2).sum() / (6 * 1e6)
    assert abs(r["brier"] - round(brier, 6)) < 1e-12
    pl = np.clip(pm, 1, 999) / 1000.0
    y = ym / 1000.0
    ll = (-(y * np.log(pl) + (1 - y) * np.log(1 - pl))).mean()
    assert abs(r["logloss"] - ll) < 1e-6


def test_classification_report_degenerate_probs_finite(spark):
    """p = 0 and p = 1 must produce finite log-loss via the [1,999]
    milli clip."""
    df = spark.createDataFrame(
        [(1, 1.0), (0, 0.0), (1, 0.0)], "y int, p double"
    )
    r = classification_report(df, "y", "p").collect()[0]
    assert math.isfinite(r["logloss"])
    assert (r["tp"], r["tn"], r["fn"]) == (1, 1, 1)


def test_classification_report_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (None, 0.5), (0, None)], "y int, p double"
    )
    r = classification_report(df, "y", "p").collect()[0]
    assert r["n"] == 1 and r["tp"] == 1


def test_classification_report_zero_denominators_null(spark):
    """All-negative labels below threshold: precision/recall/f1 NULL
    (no predicted or actual positives)."""
    df = spark.createDataFrame([(0, 0.1), (0, 0.2)], "y int, p double")
    r = classification_report(df, "y", "p").collect()[0]
    assert r["precision"] is None and r["recall"] is None
    assert r["f1"] is None and r["accuracy"] == 1.0


def test_classification_report_empty_input_zero_counts(spark):
    """Zero trainable rows must report n=0 with ZERO confusion cells
    (SUM over no rows is NULL — the operator coalesces), and NULL
    rates."""
    df = spark.createDataFrame([], "y int, p double")
    r = classification_report(df, "y", "p").collect()[0]
    assert (r["n"], r["tp"], r["fp"], r["tn"], r["fn"]) == (0, 0, 0, 0, 0)
    assert r["accuracy"] is None and r["brier"] is None


# --------------------------------------------------------------------- #
# seeded fuzz: funnel vs a per-user Python reference                    #
# --------------------------------------------------------------------- #


def _py_funnel(rows, stages, within=None):
    """Per-user greedy earliest-completion reference: sort each user's
    events by ts and advance the stage machine (strictly-after, the
    optimal existence matching)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, s in rows:
        by_user[u].append((t, s))
    reached = [0] * len(stages)
    for u, evs in by_user.items():
        evs.sort()
        times = []
        for t, s in evs:
            k = len(times)
            if k >= len(stages):
                break
            if s != stages[k]:
                continue
            if k == 0:
                times.append(t)
            elif t > times[k - 1] and (
                within is None or t <= times[0] + within
            ):
                times.append(t)
        # a later stage-1 event can't help (min-ts anchoring is
        # optimal), but the scan above only takes the FIRST stage-1:
        # that IS min ts after the sort
        for k in range(len(times)):
            reached[k] += 1
    return reached


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_funnel_random_vs_python_reference(spark, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    stages = ["a", "b", "c"]
    n = 400
    rows = [
        (
            int(rng.integers(0, 25)),
            float(np.round(rng.uniform(0, 100), 3)),
            str(rng.choice(["a", "b", "c", "x"])),
        )
        for _ in range(n)
    ]
    # distinct timestamps per user avoid tie-sensitivity between the
    # reference's sort and the strictly-after join (same contract as
    # the resample deterministic-tie caveat)
    seen = set()
    dedup = []
    for u, t, s in rows:
        while (u, t) in seen:
            t += 0.0005
        seen.add((u, t))
        dedup.append((u, t, s))
    within = None if seed % 2 == 0 else 30.0
    exp = _py_funnel(dedup, stages, within)
    out = funnel_counts(
        _ev(spark, dedup), "u", "ts", "et", stages, within=within
    ).collect()
    got = [r["n_users"] for r in sorted(out, key=lambda r: r["stage_idx"])]
    assert got == exp, (seed, got, exp)


def test_multiclass_report_hand_computed(spark):
    """3-class confusion by hand: labels a,a,a,b,b,c; preds
    a,b,a,b,b,a — exact cells, rates, macro and micro rows."""
    from duckdb_imputation_spark.ml.eval import (
        classification_report_multiclass,
    )

    rows = [("a", "a"), ("a", "b"), ("a", "a"),
            ("b", "b"), ("b", "b"), ("c", "a")]
    df = spark.createDataFrame(rows, "y string, p string")
    out = {
        r["class"]: r
        for r in classification_report_multiclass(df, "y", "p").collect()
    }
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["support"], a["tp"], a["fp"], a["fn"]) == (3, 2, 1, 1)
    assert (b["support"], b["tp"], b["fp"], b["fn"]) == (2, 2, 1, 0)
    assert (c["support"], c["tp"], c["fp"], c["fn"]) == (1, 0, 0, 1)
    assert a["precision"] == round(2 / 3, 6) and a["recall"] == round(2 / 3, 6)
    assert b["precision"] == round(2 / 3, 6) and b["recall"] == 1.0
    # c never predicted: precision NULL in its row, 0 inside macro
    assert c["precision"] is None and c["recall"] == 0.0 and c["f1"] == 0.0
    mac, mic = out["macro_avg"], out["micro_avg"]
    assert mac["precision"] == round((2 / 3 + 2 / 3 + 0.0) / 3, 6)
    assert mac["recall"] == round((2 / 3 + 1.0 + 0.0) / 3, 6)
    assert mic["support"] == 6 and mic["tp"] == 4
    assert mic["precision"] == mic["recall"] == mic["f1"] == round(4 / 6, 6)


def test_multiclass_report_pred_only_class(spark):
    """A class appearing only in predictions gets support 0, NULL
    recall, and does not enter the macro average."""
    from duckdb_imputation_spark.ml.eval import (
        classification_report_multiclass,
    )

    df = spark.createDataFrame(
        [("a", "a"), ("a", "z")], "y string, p string"
    )
    out = {
        r["class"]: r
        for r in classification_report_multiclass(df, "y", "p").collect()
    }
    z = out["z"]
    assert (z["support"], z["tp"], z["fp"], z["fn"]) == (0, 0, 1, 0)
    assert z["recall"] is None and z["precision"] == 0.0
    # macro over label-present classes only: just 'a'
    assert out["macro_avg"]["precision"] == 1.0  # a: tp=1, fp=0
    assert out["macro_avg"]["recall"] == 0.5  # a: tp=1, fn=1


def test_multiclass_report_null_rows_dropped(spark):
    from duckdb_imputation_spark.ml.eval import (
        classification_report_multiclass,
    )

    df = spark.createDataFrame(
        [("a", "a"), (None, "a"), ("a", None)], "y string, p string"
    )
    out = {
        r["class"]: r
        for r in classification_report_multiclass(df, "y", "p").collect()
    }
    assert out["a"]["support"] == 1 and out["micro_avg"]["support"] == 1


def test_multiclass_report_vs_pandas_random(spark):
    """Seeded 5-class fuzz vs a pandas crosstab reference."""
    import numpy as np
    import pandas as pd

    from duckdb_imputation_spark.ml.eval import (
        classification_report_multiclass,
    )

    rng = np.random.default_rng(23)
    n = 500
    y = rng.choice(list("abcde"), n)
    p = rng.choice(list("abcde"), n)
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in zip(y, p)], "y string, p string"
    )
    out = {
        r["class"]: r
        for r in classification_report_multiclass(df, "y", "p").collect()
    }
    for cls in "abcde":
        tp = int(((y == cls) & (p == cls)).sum())
        sup = int((y == cls).sum())
        pn = int((p == cls).sum())
        r = out[cls]
        assert (r["support"], r["tp"], r["fp"], r["fn"]) == (
            sup, tp, pn - tp, sup - tp,
        ), cls
        if pn:
            assert r["precision"] == round(tp / pn, 6), cls
        if sup:
            assert r["recall"] == round(tp / sup, 6), cls


def test_funnel_timing_hand_computed(spark):
    """Three users complete view->click at +10s, +20s, +40s; one stalls.
    Exact interpolated percentiles over the integer-microsecond deltas,
    stage-1 row pinned at zero."""
    import datetime as dt

    from duckdb_imputation_spark.operators.funnel import funnel_timing

    base = dt.datetime(2024, 1, 1)

    def T(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        (1, T(0), "view"), (1, T(10), "click"),
        (2, T(0), "view"), (2, T(20), "click"),
        (3, T(0), "view"), (3, T(40), "click"),
        (4, T(0), "view"),  # never clicks
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    out = {
        r["stage_idx"]: r
        for r in funnel_timing(
            df, "u", "ts", "et", ["view", "click"], percentiles=(0.5, 0.9)
        ).collect()
    }
    s1, s2 = out[1], out[2]
    assert s1["n_users"] == 4 and s1["p50_us"] == 0.0 and s1["p90_us"] == 0.0
    assert s2["n_users"] == 3
    # deltas in us: [10e6, 20e6, 40e6]; p50 = 20e6, p90 interpolates
    # between 20e6 and 40e6 at 0.8: 36e6
    assert s2["p50_us"] == 20e6
    assert abs(s2["p90_us"] - 36e6) < 1e-6


def test_funnel_timing_empty_stage(spark):
    """A stage nobody reaches reports n_users 0 and NULL percentiles."""
    import datetime as dt

    from duckdb_imputation_spark.operators.funnel import funnel_timing

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "view")],
        "u long, ts timestamp, et string",
    )
    out = {
        r["stage_idx"]: r
        for r in funnel_timing(df, "u", "ts", "et", ["view", "click"]).collect()
    }
    assert out[2]["n_users"] == 0 and out[2]["p50_us"] is None


def test_window_funnel_per_anchor_retry(spark):
    """The ADVICE r9 counterexample: view@0, view@100, click@150 with
    within=60 stalls at depth 1 under the min-ts anchor (funnel_users)
    but converts to depth 2 in windowFunnel semantics from the @100
    anchor."""
    import datetime as dt

    from duckdb_imputation_spark.operators.funnel import (
        funnel_users,
        window_funnel,
    )

    base = dt.datetime(2024, 1, 1)

    def T(s):
        return base + dt.timedelta(seconds=s)

    rows = [(1, T(0), "view"), (1, T(100), "view"), (1, T(150), "click")]
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    fu = funnel_users(df, "u", "ts", "et", ["view", "click"], within=60.0)
    assert fu.collect()[0]["depth"] == 1  # min-ts anchor stalls
    wf = window_funnel(df, "u", "ts", "et", ["view", "click"], within=60.0)
    assert wf.collect()[0]["depth"] == 2  # @100 anchor converts


def test_window_funnel_requires_window(spark):
    from duckdb_imputation_spark.operators.funnel import window_funnel

    df = spark.createDataFrame([(1,)], "u long")
    with pytest.raises(ValueError, match="requires a window"):
        window_funnel(df, "u", "u", "u", ["view"], within=None)


def _window_funnel_brute(events, stages, within_s):
    """Per-user reference: for every stage-1 event as anchor, greedy
    earliest chain within [anchor, anchor+within]; depth = max."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, et in events:
        by_user[u].append((t, et))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        best = 0
        for at, aet in evs:
            if aet != stages[0]:
                continue
            depth, cur = 1, at
            for k in range(1, len(stages)):
                nxt = [
                    t
                    for t, et in evs
                    if et == stages[k] and t > cur and t <= at + within_s
                ]
                if not nxt:
                    break
                cur = min(nxt)
                depth = k + 1
            best = max(best, depth)
        if best:
            out[u] = best
    return out


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_window_funnel_random_vs_python_reference(spark, seed):
    """Seeded fuzz: the join-chain depth equals the per-user per-anchor
    greedy reference, including repeated stage types."""
    import datetime as dt
    import random

    from duckdb_imputation_spark.operators.funnel import window_funnel

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    stages = ["view", "click", "view"] if seed % 2 else ["view", "click", "purchase"]
    types = ["view", "click", "purchase", "error"]
    events = []
    for u in range(1, 13):
        for _ in range(rng.randint(0, 25)):
            events.append(
                (u, rng.randint(0, 2000), rng.choice(types))
            )
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=t), et) for u, t, et in events],
        "u long, ts timestamp, et string",
    )
    within = 300.0
    got = {
        r["u"]: r["depth"]
        for r in window_funnel(df, "u", "ts", "et", stages, within).collect()
    }
    want = _window_funnel_brute(events, stages, within)
    assert got == want, seed


def test_calibration_curve_hand_computed(spark):
    """Hand-set milli probabilities across three deciles; exact bin
    cells and rational confidence/accuracy."""
    from duckdb_imputation_spark.ml.eval import calibration_curve

    rows = [
        (1, 0.95), (0, 0.95), (1, 0.90),   # bin 9: n=3, pos=2
        (1, 0.52), (0, 0.58),              # bin 5: n=2, pos=1
        (0, 0.05), (0, 0.0),               # bin 0: n=2, pos=0
        (1, 1.0),                          # pm=1000 -> clamped to bin 9
    ]
    df = spark.createDataFrame(rows, "y int, p double")
    out = {r["bin"]: r for r in calibration_curve(df, "y", "p").collect()}
    assert set(out) == {0, 5, 9}
    b9 = out[9]
    assert (b9["n"], b9["n_pos"]) == (4, 3)
    assert b9["confidence"] == round((950 + 950 + 900 + 1000) / 4000, 6)
    assert b9["accuracy"] == 0.75
    assert out[0]["accuracy"] == 0.0 and out[0]["n"] == 2
    assert out[5]["confidence"] == round((520 + 580) / 2000, 6)


def test_calibration_ece_perfect_and_worst(spark):
    """A perfectly calibrated bin contributes 0; a fully miscalibrated
    one contributes its weight."""
    from duckdb_imputation_spark.ml.eval import calibration_ece

    # bin 9: conf 0.9, acc 0.9 (9/10) -> term 0
    rows = [(1, 0.9)] * 9 + [(0, 0.9)]
    # bin 0: conf 0.0, acc 1.0 -> term |1 - 0| * 10/20
    rows += [(1, 0.0)] * 10
    df = spark.createDataFrame(rows, "y int, p double")
    out = calibration_ece(df, "y", "p").collect()[0]
    assert out["n"] == 20 and out["n_bins_used"] == 2
    assert out["ece"] == 0.5


def test_calibration_null_rows_and_empty(spark):
    from duckdb_imputation_spark.ml.eval import (
        calibration_curve,
        calibration_ece,
    )

    df = spark.createDataFrame(
        [(1, 0.5), (None, 0.9), (1, None)], "y int, p double"
    )
    bins = calibration_curve(df, "y", "p").collect()
    assert len(bins) == 1 and bins[0]["n"] == 1
    empty = spark.createDataFrame([], "y int, p double")
    out = calibration_ece(empty, "y", "p").collect()[0]
    assert out["n"] == 0 and out["ece"] is None


@pytest.mark.parametrize("seed", [5, 29])
def test_calibration_random_vs_pandas(spark, seed):
    """Seeded fuzz: bins and ECE equal a pandas reference computing the
    same milli-grid quantization and integer bin arithmetic."""
    import numpy as np
    import pandas as pd

    from duckdb_imputation_spark.ml.eval import (
        calibration_curve,
        calibration_ece,
    )

    rng = np.random.default_rng(seed)
    n = 700
    y = rng.integers(0, 2, n)
    p = rng.integers(0, 1001, n) / 1000.0  # on-grid probabilities
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, p)], "y int, p double"
    )
    pdf = pd.DataFrame({"y": y, "pm": np.rint(p * 1000).astype(int)})
    pdf["bin"] = np.minimum((pdf["pm"] * 10) // 1000, 9)
    ref = pdf.groupby("bin").agg(
        n=("y", "size"), n_pos=("y", "sum"), spm=("pm", "sum")
    )
    got = {
        r["bin"]: r for r in calibration_curve(df, "y", "p").collect()
    }
    assert set(got) == set(ref.index)
    for b, row in ref.iterrows():
        g = got[b]
        assert (g["n"], g["n_pos"]) == (row["n"], row["n_pos"]), (seed, b)
        assert g["confidence"] == round(row["spm"] / (row["n"] * 1000), 6)
        assert g["accuracy"] == round(row["n_pos"] / row["n"], 6)
    conf = ref["spm"] / (ref["n"] * 1000.0)
    acc = ref["n_pos"] / ref["n"]
    want_ece = float((ref["n"] * (acc - conf).abs()).sum() / n)
    got_ece = calibration_ece(df, "y", "p").collect()[0]["ece"]
    assert abs(got_ece - round(want_ece, 6)) < 2e-6, seed


def test_window_funnel_anchor_dedupe_and_cap(spark):
    """ADVICE r10: duplicate same-microsecond stage-1 events are deduped
    before the join chain (output already invisible via the final max);
    the hot-user cap keeps the EARLIEST-N anchors deterministically, so
    a user whose only converting anchor is late reports a LOWER depth
    when capped — the documented trade."""
    import datetime as dt

    from duckdb_imputation_spark.operators.funnel import window_funnel

    base = dt.datetime(2024, 1, 1)

    def T(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        # duplicate anchors at t=0 (identical microsecond)
        (1, T(0), "view"), (1, T(0), "view"), (1, T(30), "click"),
        # hot user: anchors at 0,10,20,...,90; click only converts
        # from the @100 anchor
        *[(2, T(10 * i), "view") for i in range(10)],
        (2, T(100), "view"), (2, T(150), "click"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    stages = ["view", "click"]
    full = {
        r["u"]: r["depth"]
        for r in window_funnel(df, "u", "ts", "et", stages, 60.0).collect()
    }
    assert full == {1: 2, 2: 2}
    capped = {
        r["u"]: r["depth"]
        for r in window_funnel(
            df, "u", "ts", "et", stages, 60.0, max_anchors_per_user=3
        ).collect()
    }
    # user 2's earliest 3 anchors (0,10,20) all miss the @150 click
    assert capped == {1: 2, 2: 1}
    with pytest.raises(ValueError, match="max_anchors_per_user"):
        window_funnel(
            df, "u", "ts", "et", stages, 60.0, max_anchors_per_user=0
        )


def test_window_funnel_anchor_stats(spark):
    """Hand-computed anchor-skew diagnostic: distinct anchors per user,
    and what a candidate cap would drop."""
    import datetime as dt

    from duckdb_imputation_spark.operators.funnel import (
        window_funnel_anchor_stats,
    )

    base = dt.datetime(2024, 1, 1)

    def T(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        (1, T(0), "view"), (1, T(0), "view"), (1, T(5), "view"),
        (2, T(0), "view"), (2, T(1), "click"),
        *[(3, T(i), "view") for i in range(7)],
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    got = window_funnel_anchor_stats(df, "u", "ts", "et", "view", cap=2)
    assert got == {
        "users": 3,
        "anchors": 2 + 1 + 7,  # user1 dedupes the t=0 twin
        "max_anchors": 7,
        "capped_users": 1,
        "dropped_anchors": 5,
    }
    free = window_funnel_anchor_stats(df, "u", "ts", "et", "view")
    assert free["capped_users"] == 0 and free["dropped_anchors"] == 0


def test_top_label_calibration_hand_computed(spark):
    """Three classes, hand-set milli probabilities: first-max argmax
    tie-break, both-ends bin clamp, exact bin cells, ECE fold."""
    from duckdb_imputation_spark.ml.eval import (
        top_label_calibration_curve,
        top_label_calibration_ece,
    )

    rows = [
        # label, pa, pb, pc  (argmax first-max: ties -> earlier column)
        ("a", 0.500, 0.500, 0.000),  # tie a/b -> pred a, correct, bin 5
        ("b", 0.200, 0.700, 0.100),  # pred b, correct, bin 7
        ("c", 0.350, 0.350, 0.300),  # tie -> pred a, WRONG, bin 3
        ("a", 1.000, 0.000, 0.000),  # pred a, correct, top clamp bin 9
        ("b", 0.100, -0.200, 1.300),  # pred c, wrong; 1.3 clamps bin 9
        (None, 0.9, 0.05, 0.05),     # dropped: NULL label
        ("a", 0.9, None, 0.05),      # dropped: NULL prob
    ]
    df = spark.createDataFrame(
        rows, "label string, pa double, pb double, pc double"
    )
    got = {
        r["bin"]: r
        for r in top_label_calibration_curve(
            df, "label", ["pa", "pb", "pc"], classes=["a", "b", "c"]
        ).collect()
    }
    assert set(got) == {5, 7, 3, 9}
    assert (got[5]["n"], got[5]["n_correct"]) == (1, 1)
    assert got[5]["confidence"] == 0.5 and got[5]["accuracy"] == 1.0
    assert (got[3]["n"], got[3]["n_correct"]) == (1, 0)
    # bin 9 holds the p=1.0 correct row and the clamped p=1.3 wrong row
    assert (got[9]["n"], got[9]["n_correct"]) == (2, 1)
    assert got[9]["confidence"] == round((1000 + 1300) / 2000, 6)
    ece = top_label_calibration_ece(
        df, "label", ["pa", "pb", "pc"], classes=["a", "b", "c"]
    ).collect()[0]
    assert ece["n"] == 5 and ece["n_bins_used"] == 4
    want = (
        1 * abs(1.0 - 0.5)
        + 1 * abs(1.0 - 0.7)
        + 1 * abs(0.0 - 0.35)
        + 2 * abs(0.5 - 1.15)
    ) / 5
    assert ece["ece"] == round(want, 6)
    with pytest.raises(ValueError, match="align"):
        top_label_calibration_curve(df, "label", ["pa"], classes=["a", "b"])


@pytest.mark.parametrize("seed", [11, 47])
def test_top_label_calibration_random_vs_pandas(spark, seed):
    """Seeded fuzz vs a pandas reference doing the same milli argmax +
    integer bin arithmetic."""
    import numpy as np
    import pandas as pd

    from duckdb_imputation_spark.ml.eval import (
        top_label_calibration_curve,
        top_label_calibration_ece,
    )

    rng = np.random.default_rng(seed)
    n, C = 600, 4
    classes = [f"c{j}" for j in range(C)]
    pm = rng.integers(0, 1001, size=(n, C))
    y = rng.integers(0, C, n)
    rows = [
        (classes[y[i]], *[float(pm[i, j]) / 1000.0 for j in range(C)])
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "label string, " + ", ".join(f"p{j} double" for j in range(C))
    )
    mx = pm.max(1)
    pred = pm.argmax(1)  # numpy first-max, same convention
    pdf = pd.DataFrame(
        {
            "bin": np.clip((mx * 10 - (mx * 10) % 1000) // 1000, 0, 9),
            "pm": mx,
            "ok": (pred == y).astype(int),
        }
    )
    ref = pdf.groupby("bin").agg(
        n=("ok", "size"), n_correct=("ok", "sum"), spm=("pm", "sum")
    )
    got = {
        r["bin"]: r
        for r in top_label_calibration_curve(
            df, "label", [f"p{j}" for j in range(C)], classes=classes
        ).collect()
    }
    assert set(got) == set(ref.index), seed
    for b, row in ref.iterrows():
        g = got[b]
        assert (g["n"], g["n_correct"]) == (row["n"], row["n_correct"])
        assert g["confidence"] == round(row["spm"] / (row["n"] * 1000), 6)
        assert g["accuracy"] == round(row["n_correct"] / row["n"], 6)
    conf = ref["spm"] / (ref["n"] * 1000.0)
    acc = ref["n_correct"] / ref["n"]
    want_ece = float((ref["n"] * (acc - conf).abs()).sum() / n)
    got_ece = top_label_calibration_ece(
        df, "label", [f"p{j}" for j in range(C)], classes=classes
    ).collect()[0]["ece"]
    assert abs(got_ece - round(want_ece, 6)) < 2e-6, seed


def test_calibration_curve_bottom_clamp(spark):
    """ADVICE r10: p < 0 no longer emits a silent negative bin — it
    clamps into bin 0."""
    from duckdb_imputation_spark.ml.eval import calibration_curve

    df = spark.createDataFrame(
        [(1, -0.3), (0, 0.05), (1, 1.2)], "y int, p double"
    )
    got = {r["bin"]: r for r in calibration_curve(df, "y", "p").collect()}
    assert set(got) == {0, 9}
    assert got[0]["n"] == 2 and got[9]["n"] == 1


def test_funnel_timing_exact_vs_approx_small_cohort(spark):
    """exact=False (corpus-scale approx_percentile) agrees with the
    exact path on a small cohort whose percentile ranks land on data
    points (21 users: (n-1)*p integer for p in .25/.5/.75/.9, so exact
    interpolation returns actual elements and GK at high accuracy
    returns the same elements)."""
    import datetime as dt

    from duckdb_imputation_spark.operators.funnel import funnel_timing

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(21):
        rows.append((u, base, "view"))
        rows.append(
            (u, base + dt.timedelta(seconds=3 * (u + 1)), "click")
        )
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    stages = ["view", "click"]
    ex = funnel_timing(df, "u", "ts", "et", stages).collect()
    ap = funnel_timing(df, "u", "ts", "et", stages, exact=False).collect()
    assert [r.asDict() for r in ex] == [r.asDict() for r in ap]
    # and both report the hand-computed ranks: deltas 3..63s step 3
    got = {r["stage_idx"]: r for r in ex}
    assert got[2]["n_users"] == 21
    assert got[2]["p50_us"] == 33_000_000.0  # 11th of 21 -> 33 s
    assert got[2]["p90_us"] == 57_000_000.0  # rank 19 -> 57 s
    # ADVICE r11 #3: a non-positive accuracy fails with a clear
    # ValueError at call time, not an opaque engine error mid-plan
    with pytest.raises(ValueError, match="accuracy"):
        funnel_timing(df, "u", "ts", "et", stages, exact=False, accuracy=0)
    # exact=True never touches accuracy — bogus values stay inert
    funnel_timing(df, "u", "ts", "et", stages, exact=True, accuracy=0)


def test_funnel_family_accepts_timestamp_ntz(spark):
    """Regression (found driving the operators on raw parquet, whose
    ts reads as TIMESTAMP_NTZ): every event-time comparison in the
    funnel family must go through a cast-to-timestamp (no-op on
    TIMESTAMP proper, optimizer-eliminated) because unix_micros and
    double-casts both reject NTZ.  Results must equal the TIMESTAMP
    run row for row — the session is UTC-pinned, so the wall clock is
    identical."""
    import datetime as dt

    from duckdb_imputation_spark.operators.funnel import (
        funnel_timing,
        funnel_users,
        window_funnel,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "view"),
        (1, base + dt.timedelta(seconds=100), "view"),
        (1, base + dt.timedelta(seconds=150), "click"),
        (2, base, "view"),
        (2, base + dt.timedelta(seconds=30), "click"),
    ]
    tz = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    ntz = tz.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
    stages = ["view", "click"]

    def rows_of(df):
        return sorted(map(str, df.collect()))

    for fn, kw in [
        (funnel_users, {"within": 60.0}),
        (window_funnel, {"within": 60.0}),
        (funnel_timing, {"within": 60.0}),
        (funnel_timing, {}),
    ]:
        got = fn(ntz, "u", "ts", "et", stages, **kw)
        want = fn(tz, "u", "ts", "et", stages, **kw)
        # timestamps in the output keep their input type; compare on
        # the type-erased string form
        assert rows_of(
            got.select(*[F.col(c).cast("string") for c in got.columns])
        ) == rows_of(
            want.select(*[F.col(c).cast("string") for c in want.columns])
        ), (fn.__name__, kw)


def test_per_class_calibration_hand_computed(spark):
    """Classwise reliability: each class's column scored against its
    one-vs-rest indicator; hand-checked cells and per-class ECE."""
    from duckdb_imputation_spark.ml.eval import (
        per_class_calibration_curve,
        per_class_calibration_ece,
    )

    rows = [
        ("a", 0.95, 0.05),
        ("a", 0.85, 0.15),
        ("b", 0.95, 0.05),   # class-a column confidently WRONG here
        ("b", 0.10, 0.90),
        (None, 0.5, 0.5),    # dropped
        ("a", 0.5, None),    # dropped
    ]
    df = spark.createDataFrame(rows, "label string, pa double, pb double")
    got = {
        (r["class"], r["bin"]): r
        for r in per_class_calibration_curve(
            df, "label", ["pa", "pb"], classes=["a", "b"]
        ).collect()
    }
    # class a, bin 9 holds pa=0.95 (y=1) and pa=0.95 (y=0)
    ga = got[("a", 9)]
    assert (ga["n"], ga["n_pos"]) == (2, 1)
    assert ga["confidence"] == 0.95 and ga["accuracy"] == 0.5
    assert got[("a", 8)]["n_pos"] == 1          # pa=0.85, true a
    assert got[("b", 0)]["n"] == 2              # pb 0.05 twice -> bin 0
    assert got[("b", 1)]["n"] == 1              # pb 0.15 -> bin 1
    assert got[("b", 9)]["n_pos"] == 1          # pb 0.90, true b
    ece = {
        r["class"]: r
        for r in per_class_calibration_ece(
            df, "label", ["pa", "pb"], classes=["a", "b"]
        ).collect()
    }
    assert set(ece) == {"a", "b"}
    assert ece["a"]["n"] == 4 and ece["b"]["n"] == 4


@pytest.mark.parametrize("seed", [7])
def test_per_class_calibration_vs_binary_curve(spark, seed):
    """Law: each class's slice of the per-class curve equals the BINARY
    calibration_curve of that column against the one-vs-rest label."""
    import numpy as np

    from duckdb_imputation_spark.ml.eval import (
        calibration_curve,
        per_class_calibration_curve,
    )

    rng = np.random.default_rng(seed)
    n, C = 400, 3
    classes = [f"c{j}" for j in range(C)]
    pm = rng.integers(0, 1001, size=(n, C))
    y = rng.integers(0, C, n)
    rows = [
        (classes[y[i]], *[float(pm[i, j]) / 1000.0 for j in range(C)])
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "label string, " + ", ".join(f"p{j} double" for j in range(C))
    )
    per = per_class_calibration_curve(
        df, "label", [f"p{j}" for j in range(C)], classes=classes
    ).collect()
    from pyspark.sql import functions as F

    for j, cname in enumerate(classes):
        bdf = df.select(
            (F.col("label") == cname).cast("int").alias("y"),
            F.col(f"p{j}").alias("p"),
        )
        want = {
            r["bin"]: (r["n"], r["n_pos"], r["confidence"], r["accuracy"])
            for r in calibration_curve(bdf, "y", "p").collect()
        }
        got = {
            r["bin"]: (r["n"], r["n_pos"], r["confidence"], r["accuracy"])
            for r in per
            if r["class"] == cname
        }
        assert got == want, cname


def test_window_funnel_strict_order_hand(spark):
    """The ClickHouse strict_order example: A->B->D->C stops A->B->C at
    D (D not a funnel condition); without strict_order it converts."""
    import datetime as dt

    from duckdb_imputation_spark.operators.funnel import window_funnel

    base = dt.datetime(2024, 1, 1)

    def T(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        (1, T(0), "A"), (1, T(10), "B"), (1, T(20), "D"), (1, T(30), "C"),
        # u2: consecutive chain, the untracked D comes AFTER completion
        (2, T(0), "A"), (2, T(10), "B"), (2, T(20), "C"), (2, T(30), "D"),
        # u3: a TRACKED interleaver (another A) also stops the chain
        (3, T(0), "A"), (3, T(10), "B"), (3, T(20), "A"), (3, T(30), "C"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    stages = ["A", "B", "C"]
    loose = {
        r["u"]: r["depth"]
        for r in window_funnel(df, "u", "ts", "et", stages, 300.0).collect()
    }
    assert loose == {1: 3, 2: 3, 3: 3}
    strict = {
        r["u"]: r["depth"]
        for r in window_funnel(
            df, "u", "ts", "et", stages, 300.0, strict_order=True
        ).collect()
    }
    # u1 stops at D; u2 converts (D after C); u3: the @20 'A' stops the
    # chain from anchor@0 at depth 2, but ITSELF anchors A->?->C... its
    # next event is C (not B) so that chain stops at 1 — depth 2.
    assert strict == {1: 2, 2: 3, 3: 2}


def _window_funnel_strict_brute(events, stages, within_s):
    """Per-anchor greedy with the strict_order interrupt: walk ALL the
    user's events strictly after the last link inside the window in
    (t, stage-first-index with untracked = -1) order; advance on the
    expected stage name, STOP on anything else."""
    from collections import defaultdict

    sset = {}
    for i, s in enumerate(stages):
        sset.setdefault(s, i)
    by_user = defaultdict(list)
    for u, t, et in events:
        by_user[u].append((t, sset.get(et, -1), et))
    out = {}
    for u, evs in by_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        best = 0
        for at, ai, aet in evs:
            if aet != stages[0]:
                continue
            depth, cur = 1, at
            while depth < len(stages):
                nxt = [
                    (t, i, et)
                    for t, i, et in evs
                    if t > cur and t <= at + within_s
                ]
                if not nxt:
                    break
                t, i, et = min(nxt, key=lambda e: (e[0], e[1]))
                if et != stages[depth]:
                    break
                cur = t
                depth += 1
            best = max(best, depth)
        if best:
            out[u] = best
    return out


@pytest.mark.parametrize("seed", [13, 57])
def test_window_funnel_strict_order_random_vs_reference(spark, seed):
    """Seeded fuzz: the strict_order join chain equals the per-anchor
    consecutive-run reference, including repeated stage types and
    untracked interrupters."""
    import datetime as dt
    import random

    from duckdb_imputation_spark.operators.funnel import window_funnel

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    stages = ["view", "click", "view"] if seed % 2 else ["view", "click", "purchase"]
    types = ["view", "click", "purchase", "error"]
    events = []
    for u in range(1, 13):
        seen = set()
        for _ in range(rng.randint(0, 25)):
            t = rng.randint(0, 2000)
            if t in seen:
                continue  # unique ts per user: equal-µs tie order is a
            seen.add(t)   # documented deviation, not the fuzz target
            events.append((u, t, rng.choice(types)))
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=t), et) for u, t, et in events],
        "u long, ts timestamp, et string",
    )
    within = 300.0
    got = {
        r["u"]: r["depth"]
        for r in window_funnel(
            df, "u", "ts", "et", stages, within, strict_order=True
        ).collect()
    }
    want = _window_funnel_strict_brute(events, stages, within)
    assert got == want, seed


def _strict_order_duckdb(events, stages, within_s):
    """DuckDB twin of window_funnel(strict_order=True) (VERDICT r11
    Next #6 — the one funnel mode whose semantics never faced DuckDB):
    anchors = DISTINCT stage-1 (user, µs); each level k pulls the FIRST
    event of ANY type strictly after t_k inside the window via a
    correlated ORDER BY t, sk LIMIT 1 subquery (sk = first matching
    stage index, -1 for untracked — the operator's documented equal-µs
    tie-break, smallest stage index first, untracked smallest of all)
    and advances only when that event's TYPE is the expected stage
    name; depth = max over anchors of the non-NULL link prefix."""
    import duckdb
    import pandas as pd

    def sk_of(et):
        for i, s in enumerate(stages):
            if s == et:
                return i
        return -1

    pdf = pd.DataFrame(
        {
            "u": [u for u, _, _ in events],
            "t": [int(t * 1_000_000) for _, t, _ in events],
            "et": [et for _, _, et in events],
            "sk": [sk_of(et) for _, _, et in events],
        }
    )
    win = int(within_s * 1_000_000)
    ctes = [
        "anchors AS (SELECT DISTINCT u, t AS a FROM ev "
        f"WHERE et = '{stages[0]}')",
        "lv1 AS (SELECT u, a, a AS t1 FROM anchors)",
    ]
    for k in range(1, len(stages)):
        ctes.append(
            f"lv{k + 1} AS (SELECT u, a, "
            + ", ".join(f"t{j + 1}" for j in range(k))
            + f""",
            (SELECT CASE WHEN b.et = '{stages[k]}' THEN b.t END
             FROM ev b
             WHERE b.u = lv{k}.u AND b.t > lv{k}.t{k}
               AND b.t <= lv{k}.a + {win}
             ORDER BY b.t, b.sk LIMIT 1) AS t{k + 1}
            FROM lv{k})"""
        )
    depth = " + ".join(
        ["1"]
        + [
            f"CASE WHEN t{k + 1} IS NOT NULL THEN 1 ELSE 0 END"
            for k in range(1, len(stages))
        ]
    )
    sql = (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT u, MAX({depth}) AS depth FROM lv{len(stages)} GROUP BY u"
    )
    con = duckdb.connect()
    con.register("ev", pdf)
    return {int(u): int(d) for u, d in con.execute(sql).fetchall()}


def test_window_funnel_strict_order_vs_duckdb_hand(spark):
    """strict_order faces DuckDB on the hand fixture (including the
    tracked-interleaver case the ClickHouse doc example misses)."""
    import datetime as dt

    from duckdb_imputation_spark.operators.funnel import window_funnel

    base = dt.datetime(2024, 1, 1)
    events = [
        (1, 0, "A"), (1, 10, "B"), (1, 20, "D"), (1, 30, "C"),
        (2, 0, "A"), (2, 10, "B"), (2, 20, "C"), (2, 30, "D"),
        (3, 0, "A"), (3, 10, "B"), (3, 20, "A"), (3, 30, "C"),
        # equal-µs tie: B and D at t=10 — untracked events carry the
        # SMALLEST sort key (-1), so D wins the "first event" slot and
        # stops the chain at depth 1 (the documented deterministic
        # choice where ClickHouse leaves same-timestamp order undefined)
        (4, 0, "A"), (4, 10, "B"), (4, 10, "D"), (4, 30, "C"),
    ]
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=t), et) for u, t, et in events],
        "u long, ts timestamp, et string",
    )
    stages = ["A", "B", "C"]
    got = {
        r["u"]: r["depth"]
        for r in window_funnel(
            df, "u", "ts", "et", stages, 300.0, strict_order=True
        ).collect()
    }
    want = _strict_order_duckdb(events, stages, 300.0)
    assert got == want == {1: 2, 2: 3, 3: 2, 4: 1}


@pytest.mark.parametrize("seed", [7, 23])
def test_window_funnel_strict_order_vs_duckdb_fuzz(spark, seed):
    """Seeded fuzz vs the DuckDB twin — INCLUDING equal-µs ties (the
    brute-reference fuzz excludes them; the SQL twin mirrors the
    documented smallest-stage-index tie-break, so ties are in scope
    here)."""
    import datetime as dt
    import random

    from duckdb_imputation_spark.operators.funnel import window_funnel

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    stages = (
        ["view", "click", "view"]
        if seed % 2
        else ["view", "click", "purchase"]
    )
    types = ["view", "click", "purchase", "error"]
    events = []
    for u in range(1, 16):
        for _ in range(rng.randint(0, 30)):
            # small range ON PURPOSE: equal-µs collisions are common
            events.append((u, rng.randint(0, 120), rng.choice(types)))
    # the operator dedupes identical (user, µs, type) rows only at the
    # anchor level; keep event rows distinct so both engines see the
    # same multiset semantics for the LIMIT 1 scan
    events = sorted(set(events))
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=t), et) for u, t, et in events],
        "u long, ts timestamp, et string",
    )
    within = 60.0
    got = {
        r["u"]: r["depth"]
        for r in window_funnel(
            df, "u", "ts", "et", stages, within, strict_order=True
        ).collect()
    }
    want = _strict_order_duckdb(events, stages, within)
    assert got == want, seed


def test_window_funnel_strict_prefilter_is_result_invariant(spark):
    """prefilter_events=True (the r14 anchor-hull pre-filter, guide
    §3.2) must return exactly the rows of the default shape — the hull
    cut only drops events no level's condition can ever consume."""
    import datetime as dt
    import random

    from duckdb_imputation_spark.operators.funnel import window_funnel

    rng = random.Random(1414)
    base = dt.datetime(2024, 1, 1)
    stages = ["view", "click", "purchase"]
    types = ["view", "click", "purchase", "error"]
    events = []
    for u in range(1, 21):
        seen = set()
        for _ in range(rng.randint(0, 30)):
            t = rng.randint(0, 3000)
            if t in seen:
                continue
            seen.add(t)
            events.append((u, t, rng.choice(types)))
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=t), et) for u, t, et in events],
        "u long, ts timestamp, et string",
    )
    plain = sorted(
        tuple(r)
        for r in window_funnel(
            df, "u", "ts", "et", stages, 300.0, strict_order=True
        ).collect()
    )
    pref = sorted(
        tuple(r)
        for r in window_funnel(
            df, "u", "ts", "et", stages, 300.0, strict_order=True,
            prefilter_events=True,
        ).collect()
    )
    assert pref == plain
