"""Time-series regularization — resample irregular samples onto a fixed
grid with linear interpolation.

The time-series face of the repo's imputation story (the reference
imputes missing CELLS; this imputes missing TIMESTAMPS): sensor /
event values sampled at irregular instants become a regular per-key
series, the shape every downstream window aggregate, forecast feature,
or training tensor wants.

Semantics (deliberately boring and exactly reproducible):

* the grid runs from each key's first sample to its last, stepping
  ``step`` — resampling never extrapolates beyond the observed range;
* a grid point landing exactly on a sample takes that sample's value;
* anything between two samples is linear interpolation
  ``vp + (vn - vp) * (t - tp) / (tn - tp)``;
* duplicate samples at one instant are averaged first.

Scale shape: ONE per-key aggregate for bounds, a bounded per-key grid
explode, then a union of samples+grid swept by two per-key ordered
windows (forward and backward last-non-null).  Everything partitions
by key — no global window, no driver loop; a key's cost is its own
sample count + grid length.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "resample_interpolate",
    "resample_agg",
    "fill_forward",
    "ewma",
    "ewma_halflife",
    "cusum",
    "retention_cohorts",
    "retention_from_periods",
    "sliding_counts",
    "seasonal_anomalies",
    "windowed_topk",
]


def resample_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step: int,
    grid_col: str = "grid_ts",
    out_col: str = "value_interp",
) -> DataFrame:
    """Resample ``(key..., ts, value)`` rows onto a per-key regular grid
    (``ts_col`` must be an integer epoch — seconds, millis, micros —
    so the grid arithmetic is exact).  Returns
    (key..., grid_col, out_col); grid points are never NULL because the
    grid spans exactly the observed range of each key."""
    keys = list(key_cols)
    # NULL observations are dropped BEFORE the per-instant average (and
    # therefore before the shuffle): an instant whose every row is NULL
    # must not anchor the sweep — a grid point landing exactly there
    # would pair a stale earlier value with that instant's timestamp
    # (pt/pv referring to different observations).  Pre-filtering is
    # equivalent to filtering the averaged result (avg ignores NULLs;
    # an all-NULL group simply vanishes) but pushes to the scan and
    # keeps the (key, ts) exchange reusable by both the bounds and the
    # union branch.
    s = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, ts_col)
        .agg(F.avg(value_col).alias("__v"))
    )
    bounds = s.groupBy(*keys).agg(
        F.min(ts_col).alias("__t0"), F.max(ts_col).alias("__t1")
    )
    grid = bounds.select(
        *keys,
        F.explode(F.sequence("__t0", "__t1", F.lit(step))).alias("__t"),
    )
    gs = grid.select(
        *keys,
        "__t",
        F.lit(None).cast("double").alias("__v"),
        F.lit(1).alias("__g"),
    )
    ss = s.select(
        *keys,
        F.col(ts_col).cast("long").alias("__t"),
        F.col("__v").cast("double").alias("__v"),
        F.lit(0).alias("__g"),
    )
    u = ss.unionByName(gs)
    # at equal __t the sample row (__g=0) sorts before the grid row in
    # BOTH sweep directions, so an exactly-hit grid point sees the
    # sample as its "previous" AND "next" neighbour
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__g"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").desc(), F.col("__g"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sample_t = F.when(F.col("__g") == 0, F.col("__t"))
    r = u.select(
        *keys,
        "__t",
        "__g",
        F.last("__v", ignorenulls=True).over(w_fwd).alias("__pv"),
        F.last(sample_t, ignorenulls=True).over(w_fwd).alias("__pt"),
        F.last("__v", ignorenulls=True).over(w_bwd).alias("__nv"),
        F.last(sample_t, ignorenulls=True).over(w_bwd).alias("__nt"),
    )
    frac = (F.col("__t") - F.col("__pt")).cast("double") / (
        F.col("__nt") - F.col("__pt")
    ).cast("double")
    interp = (
        F.when(F.col("__pt") == F.col("__t"), F.col("__pv"))
        .when(F.col("__pt").isNull() | F.col("__nt").isNull(), F.lit(None))
        .otherwise(F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac)
    )
    return r.where(F.col("__g") == 1).select(
        *keys,
        F.col("__t").alias(grid_col),
        interp.alias(out_col),
    )


def resample_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step: int,
    bucket_col: str = "bucket_ts",
    deterministic: bool = True,
) -> DataFrame:
    """OHLC-style time-bucket downsampling: one row per non-empty
    (key..., bucket) with the bucket's

    (n, v_open, v_close, v_min, v_max, v_sum)

    where open/close are the values at the bucket's FIRST/LAST
    observation by ``ts_col`` (epoch-integer; ``bucket_ts =
    floor(ts/step)*step``) — the summary a dashboard/monitoring rollup
    or a bar-chart resample needs, and the aggregate companion to
    :func:`resample_interpolate` (that one reconstructs a gap-free
    series; this one compresses a dense one).

    NULL values: ignored entirely (SQL aggregate semantics) — a bucket
    whose every value is NULL still appears (its timestamps exist) with
    n = 0 and NULL statistics.  Rows with NULL key or ts are dropped.

    Determinism knob (the repo's exact/approx philosophy applied to
    tie-breaks): ``deterministic=True`` (default, the oracle surface)
    breaks open/close ties on equal ``ts_col`` LEXICOGRAPHICALLY on
    (ts, value) via struct-ordered min/max — reproducible and
    SQL-twin-able with duplicate timestamps, but struct-ordered
    aggregates are not codegen-supported, so Spark plans a
    SortAggregate (still ONE exchange, still partial+final map-side
    combine, and the sort is spill-safe — measured as the price of
    bit-reproducibility).  ``deterministic=False`` swaps in scalar
    ``min_by``/``max_by`` (ordering = ts alone): pure whole-stage-
    codegen HashAggregate, tie choice engine-defined — the corpus fast
    path when timestamps are unique per key anyway.

    Scale shape (both modes): ONE keyed partial+final aggregate over
    (key..., bucket) — no window, no per-key series materialization
    (unlike the keyed folds, a billion-row key is FINE here: partial
    aggregation combines map-side)."""
    keys = list(key_cols)
    guard = F.col(ts_col).isNotNull()
    for k in keys:
        guard = guard & F.col(k).isNotNull()
    v = F.col(value_col).cast("double")
    bucket = (
        F.floor(F.col(ts_col) / F.lit(int(step))) * F.lit(int(step))
    ).cast("long")
    src = df.where(guard).select(
        *keys,
        bucket.alias(bucket_col),
        F.col(ts_col).alias("__t"),
        v.alias("__v"),
    )
    if deterministic:
        nn = F.when(F.col("__v").isNotNull(), F.struct("__t", "__v"))
        open_, close_ = (
            F.min(nn).getField("__v"),
            F.max(nn).getField("__v"),
        )
    else:
        # NULL ordering rows are skipped by min_by/max_by, which is
        # exactly the NULL-value exclusion open/close need
        ts_nn = F.when(F.col("__v").isNotNull(), F.col("__t"))
        open_, close_ = (
            F.min_by("__v", ts_nn),
            F.max_by("__v", ts_nn),
        )
    return src.groupBy(*keys, bucket_col).agg(
        F.count("__v").cast("long").alias("n"),
        open_.alias("v_open"),
        close_.alias("v_close"),
        F.min("__v").alias("v_min"),
        F.max("__v").alias("v_max"),
        F.sum("__v").alias("v_sum"),
    )


def fill_forward(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    backward: bool = False,
    out_suffix: str = "_filled",
) -> DataFrame:
    """LOCF gap filling (last observation carried forward) — the other
    classic time-series imputation next to interpolation: every NULL in
    ``value_cols`` takes the most recent non-null value of the same key
    (``backward=True`` carries the NEXT observation backward instead —
    NOCB).  Leading NULLs (no prior observation) stay NULL.

    ``order_col`` must be unique within a key or the fill is
    order-dependent (same caveat as every ordered sweep in this repo —
    and note the synthetic testdata's lineitem is NOT unique on
    (l_orderkey, l_linenumber); events IS unique on (user_id,
    event_id)).

    One per-key ordered window sweep per direction — no global window;
    rows per key bound the cost."""
    keys = list(key_cols)
    order = F.col(order_col).desc() if backward else F.col(order_col)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(
            c + out_suffix, F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out


def _guard_series(rows: DataFrame, max_series: int | None, op: str) -> DataFrame:
    """Optional giant-key guard for the keyed collect_list folds
    (VERDICT r7 #7): ``max_series`` turns an over-limit series into a
    DETERMINISTIC, named failure before the FOLD/EXPLODE stage runs.
    Honest scope: the check evaluates on collect_list's output, so it
    covers the band where collection itself succeeds but the fold or
    downstream explode would blow up; a key so large that collect_list
    cannot even materialize its array still dies inside the collect
    with the executor's own error (catching THAT would cost a full
    extra pre-aggregate per call).  Either way the unbounded-series
    answer is the streaming twin (``streaming.cusum_stream`` /
    ``streaming.ewma_stream``; O(keys) state, no per-key array)."""
    if max_series is None:
        return rows
    if max_series < 1:
        raise ValueError("max_series must be >= 1")
    msg = F.format_string(
        f"{op}: a key's series has %s rows, exceeding max_series="
        f"{int(max_series)} — one key cannot fit one task; use the "
        "streaming twin (O(keys) state) or raise max_series",
        F.size("__series").cast("string"),
    )
    return rows.withColumn(
        "__series",
        F.when(
            F.size("__series") <= F.lit(int(max_series)), F.col("__series")
        ).otherwise(F.raise_error(msg)),
    )


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
    max_series: int | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average (the recursive
    form, pandas ``ewm(adjust=False)``):

        s_1 = x_1;   s_t = alpha * x_t + (1 - alpha) * s_{t-1}

    Returns one row per input row with ``out_col`` attached.  EWMA is a
    sequential recurrence, so it is computed as a JVM-side ``aggregate``
    fold over each key's ordered value array (collect_list bounded by
    the key's own series length — the honest representation; no Python,
    no global window).  A key's series must fit in one task, which is
    the same bound every per-key window in this repo carries.

    ``order_col`` must be unique per key (ties make the fold order, and
    therefore the recurrence, ambiguous).

    NULL values: a NULL ``x_t`` is SKIPPED — the state ``s`` carries
    through unchanged and that row's ``out_col`` is NULL, then the
    next non-null value applies a single alpha step as if the NULL
    rows were absent.  That is pandas ``ewm(adjust=False,
    ignore_na=True)`` semantics (``ignore_na=False`` would instead
    re-weight by the gap length).  The recurrence never restarts
    mid-series.

    ``max_series`` (optional) bounds the per-key series length with a
    deterministic named error instead of an opaque 2^31-array / task
    OOM when one pathological key holds billions of rows; the
    unbounded-series path is a streaming twin with O(keys) state (see
    ``streaming.cusum_stream`` for the pattern)."""
    keys = list(key_cols)
    rows = df.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("t"), F.col(value_col).alias("x")))
        ).alias("__series")
    )
    rows = _guard_series(rows, max_series, "ewma")
    # fold carries (s, out-array); emit s after each step.  A NULL x
    # carries s through unchanged and emits NULL for that row — the
    # recurrence never restarts mid-series (the pre-fix behavior:
    # NULL x made s NULL and the next element restarted from scratch).
    def _step(acc, e):
        x = e["x"].cast("double")
        new_s = (
            F.when(x.isNull(), acc["s"])
            .when(acc["s"].isNull(), x)
            .otherwise(F.lit(alpha) * x + F.lit(1.0 - alpha) * acc["s"])
        )
        emitted = F.when(x.isNull(), F.lit(None).cast("double")).otherwise(
            new_s
        )
        return F.struct(
            new_s.alias("s"),
            F.concat(acc["out"], F.array(emitted)).alias("out"),
        )

    folded = F.aggregate(
        "__series",
        F.struct(
            F.lit(None).cast("double").alias("s"),
            F.array().cast("array<double>").alias("out"),
        ),
        _step,
        lambda acc: acc["out"],
    )
    exploded = rows.select(
        *keys, F.posexplode(folded).alias("__i", out_col), F.col("__series")
    )
    return exploded.select(
        *keys,
        F.element_at("__series", F.col("__i") + 1)["t"].alias(order_col),
        F.element_at("__series", F.col("__i") + 1)["x"].alias(value_col),
        out_col,
    )


def retention_cohorts(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    period_us: int = 7 * 86_400 * 1_000_000,
) -> DataFrame:
    """Cohort retention matrix: assign each entity (user) to the
    epoch-aligned period of its FIRST event, then count how many
    distinct entities of each cohort are still active ``offset``
    periods later — the classic product-analytics retention triangle,
    and (read over document ingest timestamps) the freshness/refresh
    profile of a training corpus.

    Returns one row per non-empty (cohort, offset) cell:
    (cohort_period, offset, n_active) — all integers, where
    ``cohort_period = floor(first_event_us / period_us)`` and
    ``offset = activity_period - cohort_period`` (offset 0 is the
    cohort's own size).

    Scale shape: (entity, period) pairs are deduplicated FIRST (one
    keyed aggregate — activity collapses to at most one row per entity
    per period, so everything downstream is bounded by
    |entities| x |periods|, not the event count); the per-entity first
    period is one more keyed aggregate over that frame; the join back
    is entity-keyed (AQE picks broadcast while the entity frame is
    small, shuffle-hash at population scale); the final cell count is
    a plain COUNT per (cohort, offset) — the DISTINCT is already
    spent.  No window, no driver loop."""
    ep = F.unix_micros(F.col(ts_col).cast("timestamp"))
    active = (
        df.where(F.col(entity_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(entity_col).alias("__e"),
            F.floor(ep / F.lit(int(period_us))).cast("long").alias("__p"),
        )
        .distinct()
    )
    return retention_from_periods(active, "__e", "__p")


def retention_from_periods(
    active: DataFrame, entity_col: str, period_col: str
) -> DataFrame:
    """The matrix half of :func:`retention_cohorts`: given ALREADY
    DEDUPLICATED (entity, period) activity rows — e.g. the state table
    :func:`..streaming.sinks.streaming_retention_sink` maintains —
    compute the (cohort_period, offset, n_active) matrix.  Input rows
    must be distinct on (entity, period); duplicates would double-count
    n_active (retention_cohorts spends the DISTINCT first)."""
    firsts = active.groupBy(entity_col).agg(
        F.min(period_col).alias("cohort_period")
    )
    return (
        active.join(firsts, entity_col)
        .groupBy(
            "cohort_period",
            (F.col(period_col) - F.col("cohort_period"))
            .cast("long")
            .alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    width: str = "2 hours",
    slide: str = "1 hour",
    by_cols: Sequence[str] = (),
) -> DataFrame:
    """Sliding (hopping) window counts: every event is assigned to all
    epoch-aligned windows of ``width`` that contain it, stepping by
    ``slide`` — ``F.window``'s overlapping mode, the batch twin of the
    Structured Streaming sliding aggregation (same function, same
    window semantics: starts at multiples of ``slide``, half-open
    ``[start, start + width)``).

    Returns (window_start_us, by_cols..., n) with the window start as
    epoch microseconds — integers end-to-end, directly comparable
    across engines.

    Scale shape: the window explode multiplies rows by
    ``width / slide`` (2x here) BEFORE one keyed partial+final
    aggregate — the standard cost of overlap; at corpus scale prefer
    the tumbling rollup plus an ``width/slide``-window rolling sum
    over the (tiny) per-period aggregate when the by-key cardinality
    allows."""
    cols = list(by_cols)
    win = F.window(F.col(ts_col).cast("timestamp"), width, slide)
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(win.alias("__w"), *cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.unix_micros(F.col("__w.start")).alias("window_start_us"),
            *cols,
            "n",
        )
    )


def ewma_halflife(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    halflife: float,
    out_col: str = "ewma",
    max_series: int | None = None,
) -> DataFrame:
    """Per-key EWMA for IRREGULARLY sampled series: the decay applied
    between two observations depends on the actual time gap,

        s_1 = x_1
        w_t = exp(-ln(2) * (t_t - t_{t-1}) / halflife)
        s_t = w_t * s_{t-1} + (1 - w_t) * x_t

    so a value observed one ``halflife`` after the previous one pulls
    the state halfway toward it, regardless of how many samples landed
    in between — the smoothing a fixed-alpha :func:`ewma` gets wrong
    the moment sampling is uneven (its per-ROW alpha over-weights
    bursts and under-weights gaps).  ``ts_col`` must be numeric (epoch
    seconds/millis/micros — ``halflife`` in the same unit) and unique
    per key.

    NULL values: skipped exactly like :func:`ewma` — the state AND the
    previous-timestamp anchor carry through unchanged (the gap keeps
    accumulating, so the next real value decays by the FULL elapsed
    time), the NULL row emits NULL.

    Same execution shape as :func:`ewma`: one keyed collect_list fold,
    JVM-side, per-key series must fit one task — ``max_series``
    (optional) turns a giant-key overflow into a deterministic named
    error (see :func:`ewma`)."""
    import math

    keys = list(key_cols)
    rows = df.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).cast("double").alias("t"),
                    F.col(value_col).alias("x"),
                )
            )
        ).alias("__series")
    )
    rows = _guard_series(rows, max_series, "ewma_halflife")
    ln2 = math.log(2.0)

    # acc carries (s, last real-observation time, out-array)
    def _step(acc, e):
        x = e["x"].cast("double")
        w = F.exp(
            F.lit(-ln2) * (e["t"] - acc["pt"]) / F.lit(float(halflife))
        )
        stepped = w * acc["s"] + (F.lit(1.0) - w) * x
        new_s = (
            F.when(x.isNull(), acc["s"])
            .when(acc["s"].isNull(), x)
            .otherwise(stepped)
        )
        new_pt = F.when(x.isNull(), acc["pt"]).otherwise(e["t"])
        emitted = F.when(x.isNull(), F.lit(None).cast("double")).otherwise(
            new_s
        )
        return F.struct(
            new_s.alias("s"),
            new_pt.alias("pt"),
            F.concat(acc["out"], F.array(emitted)).alias("out"),
        )

    folded = F.aggregate(
        "__series",
        F.struct(
            F.lit(None).cast("double").alias("s"),
            F.lit(None).cast("double").alias("pt"),
            F.array().cast("array<double>").alias("out"),
        ),
        _step,
        lambda acc: acc["out"],
    )
    exploded = rows.select(
        *keys, F.posexplode(folded).alias("__i", out_col), F.col("__series")
    )
    return exploded.select(
        *keys,
        F.element_at("__series", F.col("__i") + 1)["t"].alias(ts_col),
        F.element_at("__series", F.col("__i") + 1)["x"].alias(value_col),
        out_col,
    )


def cusum(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    target: float,
    slack: float,
    threshold: float,
    max_series: int | None = None,
) -> DataFrame:
    """Per-key two-sided CUSUM drift detector (Page 1954) — the
    sequential change-point statistic for monitoring a metric stream
    (per-source document quality, ingestion value drift) whose
    one-off spikes should NOT alarm but whose sustained shift should:

        hi_t = max(0, hi_{t-1} + (x_t - target - slack))
        lo_t = max(0, lo_{t-1} - (x_t - target + slack))

    with an alarm when either side exceeds ``threshold``; after an
    alarm the alarming side resets to 0 (restart detection).  ``slack``
    (the allowance, usually ~half the shift you care about) absorbs
    in-control noise so the statistic only accumulates sustained drift.

    Returns one row per input row:
    (key..., order_col, value_col, cusum_hi, cusum_lo, alarm) with
    ``alarm`` ∈ {0, +1 (upward shift), −1 (downward)}.

    NULL values carry both sides through unchanged and emit NULL
    statistics (no alarm) — a gap is not evidence.  Same keyed
    collect_list fold shape as :func:`ewma`: JVM-side, per-key series
    in one task, ``order_col`` unique per key.  ``max_series``
    (optional) turns a giant-key overflow into a deterministic named
    error; for genuinely unbounded series use the streaming twin
    ``streaming.cusum_stream`` (two doubles of state per key)."""
    keys = list(key_cols)
    rows = df.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("t"), F.col(value_col).alias("x")
                )
            )
        ).alias("__series")
    )
    rows = _guard_series(rows, max_series, "cusum")
    t_, s_, h_ = float(target), float(slack), float(threshold)

    def _step(acc, e):
        x = e["x"].cast("double")
        hi_raw = F.greatest(
            F.lit(0.0), acc["hi"] + (x - F.lit(t_) - F.lit(s_))
        )
        lo_raw = F.greatest(
            F.lit(0.0), acc["lo"] - (x - F.lit(t_) + F.lit(s_))
        )
        alarm = (
            F.when(hi_raw > F.lit(h_), F.lit(1))
            .when(lo_raw > F.lit(h_), F.lit(-1))
            .otherwise(F.lit(0))
        )
        hi_new = F.when(x.isNull(), acc["hi"]).otherwise(
            F.when(alarm == 1, F.lit(0.0)).otherwise(hi_raw)
        )
        lo_new = F.when(x.isNull(), acc["lo"]).otherwise(
            F.when(alarm == -1, F.lit(0.0)).otherwise(lo_raw)
        )
        emitted = F.when(
            x.isNull(),
            F.struct(
                F.lit(None).cast("double").alias("hi"),
                F.lit(None).cast("double").alias("lo"),
                F.lit(0).alias("alarm"),
            ),
        ).otherwise(
            F.struct(
                hi_raw.alias("hi"), lo_raw.alias("lo"), alarm.alias("alarm")
            )
        )
        return F.struct(
            hi_new.alias("hi"),
            lo_new.alias("lo"),
            F.concat(acc["out"], F.array(emitted)).alias("out"),
        )

    folded = F.aggregate(
        "__series",
        F.struct(
            F.lit(0.0).alias("hi"),
            F.lit(0.0).alias("lo"),
            F.array().cast(
                "array<struct<hi:double,lo:double,alarm:int>>"
            ).alias("out"),
        ),
        _step,
        lambda acc: acc["out"],
    )
    exploded = rows.select(
        *keys, F.posexplode(folded).alias("__i", "__c"), F.col("__series")
    )
    return exploded.select(
        *keys,
        F.element_at("__series", F.col("__i") + 1)["t"].alias(order_col),
        F.element_at("__series", F.col("__i") + 1)["x"].alias(value_col),
        F.col("__c.hi").alias("cusum_hi"),
        F.col("__c.lo").alias("cusum_lo"),
        F.col("__c.alarm").alias("alarm"),
    )


_SEASONAL_BUCKETS = {
    "hour_of_day": lambda c: F.hour(c),
    "day_of_week": lambda c: F.dayofweek(c),
    "hour_of_week": lambda c: (F.dayofweek(c) - 1) * 24 + F.hour(c),
}


def seasonal_anomalies(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket: str = "hour_of_day",
    z: float = 3.0,
    min_count: int = 5,
    exact_integers: bool = False,
    bucket_col: str = "seasonal_bucket",
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """Seasonal-profile anomaly screening: each observation is compared
    against the mean/std of ITS OWN (key, seasonal-bucket) stratum —
    hour-of-day / day-of-week / hour-of-week — and flagged when it sits
    more than ``z`` standard deviations out (the seasonal-naive
    baseline of classical decomposition, the first-line detector for
    metrics with daily/weekly shape where a global z-score drowns the
    seasonality).  Returns the input rows plus ``bucket_col`` and an
    integer ``flag_col``; strata with fewer than ``min_count``
    observations never flag (an unreliable profile stays silent), and
    NULL values carry a NULL flag.  A row with a NULL timestamp (so a
    NULL seasonal bucket) or a NULL key ALSO carries a NULL flag,
    explicitly: the profile join is null-unsafe equality, so such a
    row matches no stratum — there is no profile to compare against —
    and the flag expression pins that case to NULL rather than
    letting NULL-propagation decide (ADVICE r8; an oracle that inner-
    joins the profile would DROP such rows — filter NULL ts/keys
    upstream if drop semantics are wanted).

    Scale shape: ONE keyed aggregate builds the profile frame —
    bounded at |keys| x |buckets| rows (<= 168 buckets), orders of
    magnitude under the event count, so AQE broadcasts the profile
    join for any bounded key space; nothing here sorts, windows, or
    collects a series, so a key's history never has to fit one task
    (unlike the keyed folds, which need the streaming twin for that).

    ``exact_integers=True`` (requires an integral value column and an
    integral ``z``) evaluates the flag in exact DECIMAL(38,0)
    cross-multiplied form — ``(x*n - s)^2 > z^2 * (n*ss - s^2)``, the
    variance inequality scaled by n^2 — so two engines computing it
    agree bit-for-bit with no float boundary; safe while
    ``(x_max * n)^2 < 10^38`` per stratum (n ~ 10^9 observations of
    10^5-scale integers leaves 10 orders of headroom).  The default
    double path is the corpus mode."""
    if bucket not in _SEASONAL_BUCKETS:
        raise ValueError(
            f"bucket must be one of {sorted(_SEASONAL_BUCKETS)}, got {bucket!r}"
        )
    keys = list(key_cols) + [bucket_col]
    x = df.withColumn(bucket_col, _SEASONAL_BUCKETS[bucket](F.col(ts_col)))
    v = F.col(value_col)
    prof = (
        x.where(v.isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(v).alias("__s"),
            F.sum(v * v).alias("__ss"),
        )
    )
    joined = x.join(prof, keys, "left")
    if exact_integers:
        zi = int(z)
        if zi != z:
            raise ValueError("exact_integers requires an integral z")
        dec = "decimal(38,0)"
        xi, n, s, ss = (
            v.cast(dec),
            F.col("__n").cast(dec),
            F.col("__s").cast(dec),
            F.col("__ss").cast(dec),
        )
        lhs = (xi * n - s) * (xi * n - s)
        rhs = F.lit(zi * zi).cast(dec) * (n * ss - s * s)
        raw = lhs > rhs
    else:
        mean = F.col("__s") / F.col("__n")
        var = F.greatest(
            F.col("__ss") / F.col("__n") - mean * mean, F.lit(0.0)
        )
        raw = F.abs(v - mean) > F.lit(float(z)) * F.sqrt(var)
    null_key = F.lit(False)
    for k in keys:  # NULL bucket (NULL ts) or NULL key → no stratum
        null_key = null_key | F.col(k).isNull()
    flag = (
        F.when(v.isNull() | null_key, F.lit(None).cast("int"))
        .when(F.col("__n") < int(min_count), F.lit(0))
        .otherwise(raw.cast("int"))
    )
    return joined.withColumn(flag_col, flag).drop("__n", "__s", "__ss")


def windowed_topk(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    k: int,
    window: str = "1 day",
    by_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-``k`` most frequent values per event-time window (per
    optional ``by_cols`` stratum) — the "trending items" rollup
    (hot pages per day, top queries per hour per region).  Returns
    (window_start, by_cols..., value, n, rnk) with the deterministic
    (count desc, value asc) tie order.  NULL values/timestamps are
    dropped.

    Scale shape: ONE corpus GROUP BY collapses rows to the
    (window, stratum, value) dictionary — the only corpus-sized
    shuffle; the per-window rank runs over the DICTIONARY (a task
    holds one window-stratum's distinct values, bounded by the
    per-window vocabulary, never its row count).  Output is
    |windows|·|strata|·k.  For a corpus whose per-window vocabulary
    itself explodes, bound the dictionary first with the
    heavy-hitters family (sketches.py) — top-k of an MG candidate set
    is the two-pass discipline."""
    from pyspark.sql import Window as W

    v = F.col(value_col)
    keys = list(by_cols)
    d = (
        df.where(v.isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            F.window(F.col(ts_col).cast("timestamp"), window).alias("__w"),
            *keys,
            v.alias("value"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy(F.col("__w"), *keys).orderBy(
        F.desc("n"), F.col("value")
    )
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("__w.start").alias("window_start"),
            *keys,
            "value",
            F.col("n").cast("long").alias("n"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
