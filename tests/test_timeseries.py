"""Unit tests for operators/timeseries.py resample_interpolate —
hand-computed interpolations, exact-hit and duplicate semantics, and a
pure-Python randomized reference."""

import random

from duckdb_imputation_spark.operators.timeseries import resample_interpolate


def _run(spark, rows, step, keys=("k",)):
    df = spark.createDataFrame(rows, "k int, t long, v double")
    out = resample_interpolate(df, list(keys), "t", "v", step)
    return {
        (r["k"], r["grid_ts"]): r["value_interp"] for r in out.collect()
    }


def test_linear_interpolation_hand_computed(spark):
    rows = [(1, 0, 10.0), (1, 10, 20.0), (1, 40, 80.0)]
    got = _run(spark, rows, step=5)
    assert got == {
        (1, 0): 10.0,
        (1, 5): 15.0,        # halfway 10 -> 20
        (1, 10): 20.0,       # exact hit
        (1, 15): 30.0,       # 20 + (80-20) * 5/30
        (1, 20): 40.0,
        (1, 25): 50.0,
        (1, 30): 60.0,
        (1, 35): 70.0,
        (1, 40): 80.0,
    }


def test_grid_spans_observed_range_only(spark):
    rows = [(1, 3, 1.0), (1, 13, 2.0)]
    got = _run(spark, rows, step=5)
    # grid starts AT the first sample (3, 8, 13) — no extrapolation
    assert set(got) == {(1, 3), (1, 8), (1, 13)}
    assert got[(1, 3)] == 1.0 and got[(1, 13)] == 2.0
    assert abs(got[(1, 8)] - 1.5) < 1e-12


def test_duplicate_samples_average_first(spark):
    rows = [(1, 0, 10.0), (1, 0, 30.0), (1, 10, 0.0)]
    got = _run(spark, rows, step=10)
    assert got[(1, 0)] == 20.0  # avg of the duplicates
    assert got[(1, 10)] == 0.0


def test_keys_are_independent(spark):
    rows = [(1, 0, 0.0), (1, 10, 10.0), (2, 5, 100.0), (2, 15, 200.0)]
    got = _run(spark, rows, step=5)
    assert got[(1, 5)] == 5.0
    assert got[(2, 10)] == 150.0
    assert (2, 0) not in got  # key 2's grid starts at ITS first sample


def test_single_sample_key(spark):
    rows = [(1, 7, 42.0)]
    got = _run(spark, rows, step=100)
    assert got == {(1, 7): 42.0}


def test_matches_python_reference_randomized(spark):
    rng = random.Random(9)
    rows = []
    samples = {}
    for k in (1, 2, 3):
        ts = sorted(rng.sample(range(0, 1000), 12))
        for t in ts:
            v = round(rng.uniform(-50, 50), 3)
            rows.append((k, t, v))
            samples.setdefault(k, []).append((t, v))
    got = _run(spark, rows, step=37)

    def py_interp(pts, t):
        prev = max((p for p in pts if p[0] <= t), key=lambda p: p[0])
        nxt = min((p for p in pts if p[0] >= t), key=lambda p: p[0])
        if prev[0] == t:
            return prev[1]
        return prev[1] + (nxt[1] - prev[1]) * (t - prev[0]) / (nxt[0] - prev[0])

    n_checked = 0
    for k, pts in samples.items():
        t0, t1 = pts[0][0], pts[-1][0]
        for t in range(t0, t1 + 1, 37):
            assert abs(got[(k, t)] - py_interp(pts, t)) < 1e-9, (k, t)
            n_checked += 1
    assert n_checked == len(got)  # exactly the per-key grids, no extras


def test_fill_forward_locf(spark):
    from duckdb_imputation_spark.operators.timeseries import fill_forward

    rows = [
        (1, 1, None), (1, 2, 5.0), (1, 3, None), (1, 4, None), (1, 5, 7.0),
        (2, 1, 1.0), (2, 2, None),
    ]
    df = spark.createDataFrame(rows, "k int, t int, v double")
    got = {
        (r["k"], r["t"]): r["v_filled"]
        for r in fill_forward(df, ["k"], "t", ["v"]).collect()
    }
    assert got == {
        (1, 1): None,   # leading NULL stays NULL
        (1, 2): 5.0,
        (1, 3): 5.0,
        (1, 4): 5.0,
        (1, 5): 7.0,
        (2, 1): 1.0,
        (2, 2): 1.0,    # key 2's own last value, not key 1's
    }


def test_fill_backward_nocb(spark):
    from duckdb_imputation_spark.operators.timeseries import fill_forward

    rows = [(1, 1, None), (1, 2, 5.0), (1, 3, None)]
    df = spark.createDataFrame(rows, "k int, t int, v double")
    got = {
        (r["k"], r["t"]): r["v_filled"]
        for r in fill_forward(df, ["k"], "t", ["v"], backward=True).collect()
    }
    assert got == {(1, 1): 5.0, (1, 2): 5.0, (1, 3): None}


def test_fill_forward_multiple_columns(spark):
    from duckdb_imputation_spark.operators.timeseries import fill_forward

    rows = [(1, 1, 1.0, None), (1, 2, None, 9.0), (1, 3, None, None)]
    df = spark.createDataFrame(rows, "k int, t int, a double, b double")
    r = {
        r["t"]: (r["a_filled"], r["b_filled"])
        for r in fill_forward(df, ["k"], "t", ["a", "b"]).collect()
    }
    assert r == {1: (1.0, None), 2: (1.0, 9.0), 3: (1.0, 9.0)}


def test_ewma_matches_recursive_reference(spark):
    from duckdb_imputation_spark.operators.timeseries import ewma

    rng = random.Random(13)
    rows = []
    series = {}
    for k in (1, 2):
        for t in range(20):
            x = round(rng.uniform(-10, 10), 3)
            rows.append((k, t, x))
            series.setdefault(k, []).append(x)
    df = spark.createDataFrame(rows, "k int, t int, x double")
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma(df, ["k"], "t", "x", alpha=0.3).collect()
    }
    for k, xs in series.items():
        s = None
        for t, x in enumerate(xs):
            s = x if s is None else 0.3 * x + 0.7 * s
            assert abs(got[(k, t)] - s) < 1e-12, (k, t)
    assert len(got) == len(rows)  # one output row per input row


def test_ewma_preserves_order_and_value_columns(spark):
    from duckdb_imputation_spark.operators.timeseries import ewma

    rows = [(1, 3, 9.0), (1, 1, 1.0), (1, 2, 4.0)]  # unsorted input
    df = spark.createDataFrame(rows, "k int, t int, x double")
    out = {r["t"]: (r["x"], r["ewma"]) for r in ewma(df, ["k"], "t", "x", 0.5).collect()}
    assert out[1] == (1.0, 1.0)
    assert out[2] == (4.0, 2.5)        # 0.5*4 + 0.5*1
    assert out[3] == (9.0, 5.75)       # 0.5*9 + 0.5*2.5


def test_ewma_null_values_carry_state(spark):
    """A NULL x mid-series must SKIP: s carries through unchanged, the
    NULL row emits NULL, and the recurrence never restarts (the pre-fix
    behavior restarted from scratch after a NULL)."""
    from duckdb_imputation_spark.operators.timeseries import ewma

    rows = [
        (1, 1, 10.0),
        (1, 2, None),
        (1, 3, 20.0),
        (1, 4, None),
        (1, 5, 40.0),
    ]
    df = spark.createDataFrame(rows, "k int, t int, x double")
    out = {r["t"]: r["ewma"] for r in ewma(df, ["k"], "t", "x", alpha=0.5).collect()}
    s1 = 10.0
    s3 = 0.5 * 20.0 + 0.5 * s1          # carried past the NULL at t=2
    s5 = 0.5 * 40.0 + 0.5 * s3          # carried past the NULL at t=4
    assert out[1] == s1
    assert out[2] is None
    assert abs(out[3] - s3) < 1e-12
    assert out[4] is None
    assert abs(out[5] - s5) < 1e-12


def test_ewma_leading_null_then_first_value(spark):
    from duckdb_imputation_spark.operators.timeseries import ewma

    rows = [(1, 1, None), (1, 2, 8.0), (1, 3, 4.0)]
    df = spark.createDataFrame(rows, "k int, t int, x double")
    out = {r["t"]: r["ewma"] for r in ewma(df, ["k"], "t", "x", alpha=0.25).collect()}
    assert out[1] is None
    assert out[2] == 8.0                 # first OBSERVED value seeds s
    assert abs(out[3] - (0.25 * 4.0 + 0.75 * 8.0)) < 1e-12


def test_resample_null_sample_instant_dropped(spark):
    """An instant whose every row is NULL must not anchor the sweep: an
    exact-hit grid point there interpolates from the real neighbours
    instead of returning a stale earlier value with a mismatched
    timestamp (the ADVICE r5 finding)."""
    from duckdb_imputation_spark.operators.timeseries import (
        resample_interpolate,
    )

    rows = [(1, 0, 0.0), (1, 10, None), (1, 20, 20.0)]
    df = spark.createDataFrame(rows, "k int, ts long, v double")
    out = {
        r["grid_ts"]: r["value_interp"]
        for r in resample_interpolate(df, ["k"], "ts", "v", step=10).collect()
    }
    # pre-fix: grid point 10 matched sample_t=10 via __pt but kept
    # __pv=0.0 (t=0's value) -> returned 0.0.  Correct: interpolate
    # between the real neighbours (0, 0.0) and (20, 20.0) -> 10.0.
    assert out[0] == 0.0
    assert abs(out[10] - 10.0) < 1e-12
    assert out[20] == 20.0


def test_resample_all_null_key_vanishes(spark):
    from duckdb_imputation_spark.operators.timeseries import (
        resample_interpolate,
    )

    rows = [(1, 0, None), (1, 10, None), (2, 0, 1.0), (2, 10, 3.0)]
    df = spark.createDataFrame(rows, "k int, ts long, v double")
    out = resample_interpolate(df, ["k"], "ts", "v", step=10).collect()
    assert {r["k"] for r in out} == {2}  # no observations -> no grid


# ------------------------------------------------------------------ #
# retention_cohorts                                                   #
# ------------------------------------------------------------------ #

def _retention(spark, rows, period=10):
    from duckdb_imputation_spark.operators.timeseries import (
        retention_cohorts,
    )

    df = spark.createDataFrame(rows, "u int, ts timestamp_ntz")
    out = retention_cohorts(df, "u", "ts", period_us=period)
    return {
        (r["cohort_period"], r["offset"]): r["n_active"]
        for r in out.collect()
    }


def _ts_us(us):
    import datetime

    return datetime.datetime(1970, 1, 1) + datetime.timedelta(
        microseconds=us
    )


def test_retention_hand_computed(spark):
    # period = 10 µs.  u1 first in period 0, active 0 and 2;
    # u2 first in period 0, active 0, 1; u3 first in period 2.
    rows = [
        (1, _ts_us(3)), (1, _ts_us(25)),
        (2, _ts_us(9)), (2, _ts_us(11)),
        (3, _ts_us(29)),
    ]
    got = _retention(spark, rows)
    assert got == {
        (0, 0): 2,   # u1, u2
        (0, 1): 1,   # u2
        (0, 2): 1,   # u1
        (2, 0): 1,   # u3
    }


def test_retention_dedups_within_period_and_skips_nulls(spark):
    # three events of u1 in one period count once; NULL user/ts ignored
    rows = [
        (1, _ts_us(1)), (1, _ts_us(2)), (1, _ts_us(3)),
        (None, _ts_us(5)), (2, None),
    ]
    got = _retention(spark, rows)
    assert got == {(0, 0): 1}


def test_retention_offset_zero_is_cohort_size(spark):
    import random

    rng = random.Random(7)
    rows = [
        (u, _ts_us(rng.randrange(0, 50)))
        for u in range(20)
        for _ in range(rng.randrange(1, 4))
    ]
    got = _retention(spark, rows)
    cohort_sizes = {}
    first = {}
    active = set()
    for u, t in rows:
        us = int((t - _ts_us(0)).total_seconds() * 1_000_000)
        p = us // 10
        first[u] = min(first.get(u, p), p)
        active.add((u, p))
    for u, p0 in first.items():
        cohort_sizes[p0] = cohort_sizes.get(p0, 0) + 1
    for (c, off), n in got.items():
        expect = len(
            {u for (u, p) in active if first[u] == c and p - c == off}
        )
        assert n == expect
    for c, size in cohort_sizes.items():
        assert got[(c, 0)] == size


# ------------------------------------------------------------------ #
# sliding_counts                                                      #
# ------------------------------------------------------------------ #

def test_sliding_counts_two_windows_per_event(spark):
    from duckdb_imputation_spark.operators.timeseries import sliding_counts

    import datetime

    base = datetime.datetime(2024, 1, 1, 10, 30)  # inside hour 10
    rows = [(base,), (base + datetime.timedelta(hours=1),)]
    df = spark.createDataFrame(rows, "ts timestamp_ntz")
    out = {
        r["window_start_us"]: r["n"]
        for r in sliding_counts(df, "ts", "2 hours", "1 hour").collect()
    }
    h = 3_600_000_000
    t10 = int(
        (datetime.datetime(2024, 1, 1, 10) - datetime.datetime(1970, 1, 1))
        .total_seconds()
    ) * 1_000_000
    # event at 10:30 -> windows starting 09:00 and 10:00; 11:30 -> 10:00, 11:00
    assert out == {t10 - h: 1, t10: 2, t10 + h: 1}
    # every event appears in exactly width/slide windows
    assert sum(out.values()) == 2 * len(rows)


def test_sliding_counts_grouped_and_null_ts(spark):
    from duckdb_imputation_spark.operators.timeseries import sliding_counts

    import datetime

    t = datetime.datetime(2024, 1, 2, 0, 5)
    df = spark.createDataFrame(
        [(t, "a"), (t, "a"), (t, "b"), (None, "a")],
        "ts timestamp_ntz, k string",
    )
    out = sliding_counts(df, "ts", "2 hours", "1 hour", by_cols=["k"])
    rows = out.collect()
    # NULL ts dropped; each event in 2 windows
    assert sum(r["n"] for r in rows) == 2 * 3
    assert {r["k"] for r in rows} == {"a", "b"}


# ------------------------------------------------------------------ #
# ewma_halflife                                                       #
# ------------------------------------------------------------------ #

def _hl(spark, rows, halflife):
    from duckdb_imputation_spark.operators.timeseries import ewma_halflife

    df = spark.createDataFrame(rows, "k int, t long, x double")
    out = ewma_halflife(df, ["k"], "t", "x", halflife)
    return {(r["k"], r["t"]): r["ewma"] for r in out.collect()}


def test_ewma_halflife_hand_computed(spark):
    # gap exactly one halflife -> state moves exactly halfway
    rows = [(1, 0, 10.0), (1, 10, 20.0), (1, 30, 0.0)]
    got = _hl(spark, rows, halflife=10.0)
    assert got[(1, 0)] == 10.0
    assert abs(got[(1, 10)] - 15.0) < 1e-12          # halfway 10 -> 20
    # two halflives: w = 1/4, s = 0.25*15 + 0.75*0 = 3.75
    assert abs(got[(1, 30)] - 3.75) < 1e-12


def test_ewma_halflife_time_rescaling_invariance(spark):
    # the POINT of the variant: only the RATIO gap/halflife matters —
    # stretching all timestamps and the halflife by the same factor
    # leaves every smoothed value unchanged (a fixed-alpha ewma has no
    # such notion: it weights by ROW COUNT, not wall time)
    rows = [(1, 0, 3.0), (1, 7, -1.0), (1, 9, 4.0), (1, 30, 0.5)]
    a = _hl(spark, rows, halflife=10.0)
    b = _hl(spark, [(k, t * 6, x) for k, t, x in rows], halflife=60.0)
    for (k, t), v in a.items():
        assert abs(b[(k, t * 6)] - v) < 1e-12


def test_ewma_halflife_null_skip_accumulates_gap(spark):
    # NULL at t=10 emits NULL and does NOT reset the time anchor: the
    # value at t=20 decays by the FULL 20 units (w = 1/4)
    rows = [(1, 0, 8.0), (1, 10, None), (1, 20, 0.0)]
    got = _hl(spark, rows, halflife=10.0)
    assert got[(1, 10)] is None
    assert abs(got[(1, 20)] - 2.0) < 1e-12   # 0.25*8 + 0.75*0


def test_ewma_halflife_python_twin_randomized(spark):
    import math
    import random

    rng = random.Random(5)
    rows = []
    for k in (1, 2):
        t = 0
        for _ in range(40):
            t += rng.randrange(1, 30)
            x = None if rng.random() < 0.15 else round(rng.uniform(-5, 5), 3)
            rows.append((k, t, x))
    got = _hl(spark, rows, halflife=17.0)

    for k in (1, 2):
        series = sorted((t, x) for kk, t, x in rows if kk == k)
        s, pt = None, None
        for t, x in series:
            if x is None:
                assert got[(k, t)] is None
                continue
            if s is None:
                s = x
            else:
                w = math.exp(-math.log(2.0) * (t - pt) / 17.0)
                s = w * s + (1.0 - w) * x
            pt = t
            assert abs(got[(k, t)] - s) < 1e-9, (k, t)


# ------------------------------------------------------------------ #
# cusum                                                               #
# ------------------------------------------------------------------ #

def _cusum(spark, rows, **kw):
    from duckdb_imputation_spark.operators.timeseries import cusum

    df = spark.createDataFrame(rows, "k int, t long, x double")
    out = cusum(df, ["k"], "t", "x", **kw)
    return {
        (r["k"], r["t"]): (r["cusum_hi"], r["cusum_lo"], r["alarm"])
        for r in out.collect()
    }


def test_cusum_sustained_shift_alarms_spike_does_not(spark):
    # target 0, slack 0.5, threshold 2: one spike of 2 accumulates only
    # 1.5 (< 2, no alarm) and drains; a sustained shift of +1.5 adds
    # 1.0 per step and alarms on the 3rd shifted sample
    spike = [(1, 1, 0.0), (1, 2, 2.0), (1, 3, 0.0), (1, 4, 0.0)]
    got = _cusum(spark, spike, target=0.0, slack=0.5, threshold=2.0)
    assert all(a == 0 for _, _, a in got.values())
    shift = [(1, 1, 0.0), (1, 2, 1.5), (1, 3, 1.5), (1, 4, 1.5)]
    got = _cusum(spark, shift, target=0.0, slack=0.5, threshold=2.0)
    assert got[(1, 2)][2] == 0 and got[(1, 3)][2] == 0
    assert got[(1, 4)][0] == 3.0 and got[(1, 4)][2] == 1


def test_cusum_downward_side_and_reset_after_alarm(spark):
    rows = [(1, i, -2.0) for i in range(1, 4)] + [(1, 4, 0.0)]
    got = _cusum(spark, rows, target=0.0, slack=0.5, threshold=2.0)
    # lo accumulates 1.5/step: 1.5, 3.0 -> alarm at t=2
    assert got[(1, 2)][1] == 3.0 and got[(1, 2)][2] == -1
    # reset after the alarm: t=3 restarts from 0 -> 1.5, no alarm
    assert got[(1, 3)][1] == 1.5 and got[(1, 3)][2] == 0
    assert got[(1, 4)][2] == 0


def test_cusum_null_is_not_evidence(spark):
    rows = [(1, 1, 1.5), (1, 2, None), (1, 3, 1.5), (1, 4, 1.5)]
    got = _cusum(spark, rows, target=0.0, slack=0.5, threshold=2.0)
    assert got[(1, 2)] == (None, None, 0)
    # state carried through the NULL: 1.0, then 2.0, then 3.0 -> alarm
    assert got[(1, 3)][0] == 2.0
    assert got[(1, 4)][0] == 3.0 and got[(1, 4)][2] == 1


def test_cusum_python_twin_randomized(spark):
    import random

    rng = random.Random(9)
    rows = []
    for k in (1, 2):
        for t in range(1, 60):
            x = None if rng.random() < 0.1 else round(rng.gauss(0, 1), 3)
            rows.append((k, t, x))
    got = _cusum(spark, rows, target=0.0, slack=0.5, threshold=3.0)
    for k in (1, 2):
        hi = lo = 0.0
        for t in range(1, 60):
            x = dict(((kk, tt), xx) for kk, tt, xx in rows)[(k, t)]
            if x is None:
                assert got[(k, t)] == (None, None, 0)
                continue
            hi_raw = max(0.0, hi + (x - 0.0 - 0.5))
            lo_raw = max(0.0, lo - (x - 0.0 + 0.5))
            alarm = 1 if hi_raw > 3.0 else (-1 if lo_raw > 3.0 else 0)
            hi = 0.0 if alarm == 1 else hi_raw
            lo = 0.0 if alarm == -1 else lo_raw
            g = got[(k, t)]
            assert abs(g[0] - hi_raw) < 1e-9
            assert abs(g[1] - lo_raw) < 1e-9
            assert g[2] == alarm


# ------------------------------------------------------------------ #
# max_series giant-key guard (VERDICT r7 #7)                          #
# ------------------------------------------------------------------ #

def test_max_series_guard_passes_and_fails_deterministically(spark):
    """Under the cap the result is untouched; over it the fold dies
    with a NAMED error pointing at the streaming twin, not an opaque
    array-bound / task OOM."""
    import pytest
    from duckdb_imputation_spark.operators.timeseries import (
        cusum,
        ewma,
        ewma_halflife,
    )

    rows = [(1, t, float(t)) for t in range(10)] + [(2, 0, 5.0)]
    df = spark.createDataFrame(rows, "k int, t int, x double")

    ok = ewma(df, ["k"], "t", "x", alpha=0.5, max_series=10).collect()
    assert len(ok) == 11
    base = {(r["k"], r["t"]): r["ewma"]
            for r in ewma(df, ["k"], "t", "x", alpha=0.5).collect()}
    capped = {(r["k"], r["t"]): r["ewma"]
              for r in ewma(df, ["k"], "t", "x", alpha=0.5,
                            max_series=10).collect()}
    assert capped == base

    for fn, kw in (
        (ewma, dict(alpha=0.5)),
        (ewma_halflife, dict(halflife=2.0)),
        (cusum, dict(target=0.0, slack=0.5, threshold=3.0)),
    ):
        with pytest.raises(Exception, match="max_series"):
            fn(df, ["k"], "t", "x", max_series=9, **kw).collect()

    with pytest.raises(ValueError, match="max_series"):
        ewma(df, ["k"], "t", "x", alpha=0.5, max_series=0).collect()


# ------------------------------------------------------------------ #
# resample_agg (OHLC-style bucket downsampling)                       #
# ------------------------------------------------------------------ #

def test_resample_agg_hand_computed(spark):
    from duckdb_imputation_spark.operators.timeseries import resample_agg

    rows = [
        (1, 0, 5.0), (1, 3, 1.0), (1, 7, 9.0),       # bucket 0
        (1, 10, 2.0), (1, 12, None), (1, 14, 4.0),   # bucket 10
        (2, 5, -1.0),                                  # other key
        (None, 2, 9.9),                                # NULL key drops
        (1, None, 3.3),                                # NULL ts drops
    ]
    df = spark.createDataFrame(rows, "k int, t long, x double")
    got = {
        (r["k"], r["bucket_ts"]): (
            r["n"], r["v_open"], r["v_close"], r["v_min"], r["v_max"],
            r["v_sum"],
        )
        for r in resample_agg(df, ["k"], "t", "x", step=10).collect()
    }
    assert got == {
        (1, 0): (3, 5.0, 9.0, 1.0, 9.0, 15.0),
        (1, 10): (2, 2.0, 4.0, 2.0, 4.0, 6.0),
        (2, 0): (1, -1.0, -1.0, -1.0, -1.0, -1.0),
    }


def test_resample_agg_all_null_bucket_and_tie_break(spark):
    from duckdb_imputation_spark.operators.timeseries import resample_agg

    rows = [
        (1, 0, None), (1, 5, None),        # all-NULL bucket: n=0 row
        (1, 10, 7.0), (1, 10, 3.0),        # tie on ts: lexicographic
    ]
    df = spark.createDataFrame(rows, "k int, t long, x double")
    got = {
        (r["k"], r["bucket_ts"]): (
            r["n"], r["v_open"], r["v_close"], r["v_sum"]
        )
        for r in resample_agg(df, ["k"], "t", "x", step=10).collect()
    }
    assert got[(1, 0)] == (0, None, None, None)
    # open = min(struct(10,3),(10,7)) -> 3; close = max -> 7
    assert got[(1, 10)] == (2, 3.0, 7.0, 10.0)


def test_resample_agg_plan_shape_both_modes(spark):
    """Exactly ONE keyed exchange in both modes, no window, no per-key
    array.  deterministic=True pays a SortAggregate for the
    lexicographic tie-break (struct-ordered min/max are not
    codegen-supported); deterministic=False is pure HashAggregate."""
    from duckdb_imputation_spark.operators.timeseries import resample_agg

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = df.selectExpr(
        "user_id", "CAST(unix_micros(CAST(ts AS TIMESTAMP))/1000000 AS LONG) AS t",
        "value",
    )
    for det, agg_node in ((True, "SortAggregate"), (False, "HashAggregate")):
        out = resample_agg(
            src, ["user_id"], "t", "value", step=3600, deterministic=det
        )
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange hashpartitioning") == 1, det
        assert agg_node in final, det
        assert "Window" not in final and "collect_list" not in final, det
        if not det:
            assert "SortAggregate" not in final and "Sort " not in final


def test_resample_agg_fast_mode_matches_on_unique_timestamps(spark):
    """With unique ts per key, both modes agree exactly (the tie-break
    never fires)."""
    from duckdb_imputation_spark.operators.timeseries import resample_agg

    rows = [(1, t, float((t * 7) % 13)) for t in range(50)] + [
        (2, t, float(t)) for t in range(0, 40, 3)
    ]
    df = spark.createDataFrame(rows, "k int, t long, x double")
    a = {
        (r["k"], r["bucket_ts"]): tuple(r)[2:]
        for r in resample_agg(df, ["k"], "t", "x", step=10).collect()
    }
    b = {
        (r["k"], r["bucket_ts"]): tuple(r)[2:]
        for r in resample_agg(
            df, ["k"], "t", "x", step=10, deterministic=False
        ).collect()
    }
    assert a == b and len(a) == 5 + 4


# --------------------------------------------------------------------- #
# seasonal_anomalies                                                     #
# --------------------------------------------------------------------- #


def _py_seasonal(rows, z=3.0, min_count=5):
    """rows: (key, hour, value|None) -> dict idx -> flag (None for NULL
    values).  Brute-force per-(key,hour) mean/std flags."""
    import math

    strata = {}
    for k, h, v in rows:
        if v is not None:
            strata.setdefault((k, h), []).append(v)
    flags = []
    for k, h, v in rows:
        if v is None:
            flags.append(None)
            continue
        vals = strata[(k, h)]
        n = len(vals)
        if n < min_count:
            flags.append(0)
            continue
        mean = sum(vals) / n
        var = max(sum(x * x for x in vals) / n - mean * mean, 0.0)
        flags.append(1 if abs(v - mean) > z * math.sqrt(var) else 0)
    return flags


def _seasonal_input(spark, rows):
    import datetime

    data = [
        (
            i,
            k,
            datetime.datetime(2024, 1, 1 + i % 20, h, i % 60),
            float(v) if v is not None else None,
        )
        for i, (k, h, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "idx long, key string, ts timestamp, value double"
    )


def test_seasonal_anomalies_matches_bruteforce(spark):
    import random

    from duckdb_imputation_spark.operators.timeseries import (
        seasonal_anomalies,
    )

    rng = random.Random(11)
    rows = []
    for _ in range(400):
        k = rng.choice(["a", "b"])
        h = rng.choice([3, 9, 15])
        v = rng.gauss(100.0 if h == 3 else 40.0, 5.0)
        if rng.random() < 0.03:
            v += 60.0  # planted outliers
        if rng.random() < 0.02:
            v = None
        rows.append((k, h, v))
    out = seasonal_anomalies(
        _seasonal_input(spark, rows), ["key"], "ts", "value"
    )
    got = {r["idx"]: r["is_anomaly"] for r in out.collect()}
    want = _py_seasonal(rows)
    assert [got[i] for i in range(len(rows))] == want
    assert sum(f or 0 for f in want) > 0  # the planted outliers fired


def test_seasonal_anomalies_exact_integer_mode(spark):
    import random

    from duckdb_imputation_spark.operators.timeseries import (
        seasonal_anomalies,
    )

    rng = random.Random(5)
    rows = [
        ("a", rng.choice([1, 2]), float(rng.randrange(0, 5000)))
        for _ in range(300)
    ]
    from pyspark.sql import functions as F

    df = _seasonal_input(spark, rows).withColumn(
        "value", F.col("value").cast("long")
    )
    exact = seasonal_anomalies(
        df, ["key"], "ts", "value", exact_integers=True
    )
    got = {r["idx"]: r["is_anomaly"] for r in exact.collect()}
    want = _py_seasonal(rows)
    assert [got[i] for i in range(len(rows))] == want


def test_seasonal_anomalies_min_count_and_null(spark):
    from duckdb_imputation_spark.operators.timeseries import (
        seasonal_anomalies,
    )

    # 4 observations in the stratum (< min_count=5): the wild outlier
    # must stay silent; the NULL row carries a NULL flag.
    rows = [("a", 7, 1.0), ("a", 7, 1.0), ("a", 7, 1.0), ("a", 7, 999.0),
            ("a", 7, None)]
    out = seasonal_anomalies(
        _seasonal_input(spark, rows), ["key"], "ts", "value"
    )
    got = {r["idx"]: r["is_anomaly"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: None}


def test_seasonal_anomalies_bad_bucket_raises(spark):
    import pytest

    from duckdb_imputation_spark.operators.timeseries import (
        seasonal_anomalies,
    )

    with pytest.raises(ValueError, match="bucket"):
        seasonal_anomalies(
            _seasonal_input(spark, [("a", 1, 1.0)]),
            ["key"], "ts", "value", bucket="fortnight",
        )
    with pytest.raises(ValueError, match="integral z"):
        seasonal_anomalies(
            _seasonal_input(spark, [("a", 1, 1.0)]),
            ["key"], "ts", "value", z=2.5, exact_integers=True,
        )


# ------------------------------------------------- windowed top-k

def test_windowed_topk_matches_python_reference(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.timeseries import windowed_topk

    rows = []
    for day in (1, 2):
        for i in range(60):
            page = f"p{i % (3 + day)}"  # different hot sets per day
            rows.append((f"2024-05-0{day} 0{i % 10}:00:00", page))
    rows.append(("2024-05-01 01:00:00", None))  # dropped
    df = spark.createDataFrame(rows, "ts_s string, page string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "page"
    )
    got = windowed_topk(df, "ts", "page", k=2, window="1 day").collect()
    by_day = {}
    for r in got:
        by_day.setdefault(str(r["window_start"])[:10], []).append(r)
    for day in (1, 2):
        key = f"2024-05-0{day}"
        cnt = Counter(
            p for ts_s, p in rows if p is not None and ts_s[:10] == key
        )
        exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        g = sorted(by_day[key], key=lambda r: r["rnk"])
        assert [(r["value"], r["n"]) for r in g] == exp, (key, g, exp)
        assert [r["rnk"] for r in g] == [1, 2]


def test_windowed_topk_tie_break_and_strata(spark):
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.timeseries import windowed_topk

    # exact count ties -> value ascending
    rows = [("2024-05-01 00:00:00", "g1", "b"),
            ("2024-05-01 01:00:00", "g1", "a"),
            ("2024-05-01 02:00:00", "g1", "c"),
            ("2024-05-01 03:00:00", "g2", "z")]
    df = spark.createDataFrame(
        rows, "ts_s string, g string, page string"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "g", "page")
    got = windowed_topk(
        df, "ts", "page", k=2, window="1 day", by_cols=["g"]
    ).collect()
    g1 = sorted(
        [r for r in got if r["g"] == "g1"], key=lambda r: r["rnk"]
    )
    assert [r["value"] for r in g1] == ["a", "b"]  # tie -> asc value
    assert [r["value"] for r in got if r["g"] == "g2"] == ["z"]


def test_seasonal_anomalies_null_ts_and_key_get_null_flag(spark):
    """ADVICE r8: a NULL timestamp (NULL seasonal bucket) or NULL key
    matches no profile stratum — the flag is explicitly NULL and the
    row survives."""
    from duckdb_imputation_spark.operators.timeseries import (
        seasonal_anomalies,
    )

    rows = [
        ("k", "2024-01-01 10:00:00", float(v))
        for v in (10, 11, 9, 10, 12, 10)
    ] + [
        ("k", None, 10.0),      # NULL ts -> NULL bucket
        (None, "2024-01-01 10:00:00", 10.0),  # NULL key
    ]
    df = spark.createDataFrame(
        rows, "key string, ts_s string, value double"
    ).selectExpr("key", "cast(ts_s as timestamp) as ts", "value")
    out = seasonal_anomalies(df, ["key"], "ts", "value").collect()
    assert len(out) == len(rows)
    nulls = [r for r in out if r["ts"] is None or r["key"] is None]
    assert len(nulls) == 2
    assert all(r["is_anomaly"] is None for r in nulls)
    rest = [r for r in out if r["ts"] is not None and r["key"] is not None]
    assert all(r["is_anomaly"] is not None for r in rest)
