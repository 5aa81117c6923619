"""Classifier evaluation in-engine — the confusion-matrix family from
ONE aggregate scan.

Companion to operators/stats.auc_score (threshold-free ranking
quality): this is the THRESHOLDED report — confusion counts, the
derived rates, Brier score and log-loss — for a chosen operating
point, computed without collecting scores to the driver.

Exactness discipline: with ``milli=True`` (default) the probability is
first rounded to integer milli-units, so the confusion counts AND the
Brier sum Σ(p−y)² are exact integers (SSE in milli²-units fits BIGINT
far beyond 100 TB row counts) — engines can disagree only on the
log-loss surface (per-row ln), which gets the stat-class rounding the
hypothesis-test rows established.

Scale shape: ONE conditional aggregate (map-side combined, no shuffle
beyond the scalar gather), a handful of doubles/longs out.  Public
spec: Brier, Monthly Weather Review 1950; log-loss per Good 1952.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["classification_report"]


def classification_report(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    threshold: float = 0.5,
    milli: bool = True,
    round_digits: int | None = 6,
) -> DataFrame:
    """One-row evaluation of probability ``prob_col`` against the 0/1
    ``label_col`` at ``threshold``: confusion counts (tp/fp/tn/fn),
    accuracy / precision / recall / F1, Brier score and log-loss.
    NULL-label or NULL-prob rows are dropped (counted in none of the
    cells).  Rate/F1 columns are NULL when their denominator is zero.

    ``milli=True`` quantizes p to integer milli-units first: the
    confusion cells and the Brier numerator become exact integers (the
    mice_recovery_rmse discipline), leaving per-row ln as the only
    float surface.  THE THRESHOLD ITSELF IS APPLIED ON THE MILLI GRID:
    a row is positive iff round(p·1000) >= round(threshold·1000), so
    raw p in [threshold−0.0005, threshold) classifies POSITIVE — the
    operating point moves by up to half a milli-step vs thresholding
    the raw probability (ADVICE r9).  This is deliberate: p is
    typically a sigmoid (transcendental), and two engines computing it
    can disagree in the last ulp — a raw-p comparison at the boundary
    would make confusion cells engine-dependent, while the milli-grid
    decision is bit-reproducible everywhere.  Pass ``milli=False`` for
    raw-threshold semantics when cross-engine exactness is not needed.
    For log-loss, milli-probabilities are clipped to [1, 999] so
    degenerate 0/1 predictions stay finite (the standard eps-clip,
    made deterministic by the integer grid)."""
    y = F.col(label_col).cast("double")
    p: Column = F.col(prob_col).cast("double")
    src = df.where(
        F.col(label_col).isNotNull() & F.col(prob_col).isNotNull()
    )
    if milli:
        pm = F.round(p * 1000.0).cast("long")
        pos = pm >= F.lit(int(round(threshold * 1000)))
        ym = (y * 1000).cast("long")
        brier_num = F.sum((pm - ym) * (pm - ym))  # exact BIGINT
        pl = F.least(F.greatest(pm, F.lit(1)), F.lit(999)).cast(
            "double"
        ) / F.lit(1000.0)
    else:
        pos = p >= F.lit(threshold)
        brier_num = F.sum((p - y) * (p - y))
        pl = F.least(
            F.greatest(p, F.lit(1e-15)), F.lit(1.0 - 1e-15)
        )
    ll = -(y * F.log(pl) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - pl))
    is_pos = y == 1.0
    # coalesce: SUM over zero rows is NULL — an empty (or all-NULL)
    # input must still report zeros, not a NULL confusion matrix
    agg = src.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum((pos & is_pos).cast("long")), F.lit(0)).alias("tp"),
        F.coalesce(F.sum((pos & ~is_pos).cast("long")), F.lit(0)).alias("fp"),
        F.coalesce(F.sum((~pos & ~is_pos).cast("long")), F.lit(0)).alias("tn"),
        F.coalesce(F.sum((~pos & is_pos).cast("long")), F.lit(0)).alias("fn"),
        brier_num.alias("__bn"),
        F.sum(ll).alias("__ll"),
    )
    # ANSI mode (Spark 4 default) raises on x/0 — every n-denominated
    # rate is NULL-guarded, not left to non-ANSI NULL coercion
    has_rows = F.col("n") > 0
    n = F.col("n").cast("double")
    tp, fp = F.col("tp").cast("double"), F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    acc = F.when(has_rows, (tp + F.col("tn").cast("double")) / n)
    prec = F.when(F.col("tp") + F.col("fp") > 0, tp / (tp + fp))
    rec = F.when(F.col("tp") + F.col("fn") > 0, tp / (tp + fn))
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2 * tp / (2 * tp + fp + fn),
    )
    brier = F.when(
        has_rows,
        F.col("__bn").cast("double") / (n * F.lit(1e6))
        if milli
        else F.col("__bn").cast("double") / n,
    )
    logloss = F.when(has_rows, F.col("__ll") / n)

    def rnd(c: Column) -> Column:
        if round_digits is None:
            return c
        # integer-tier scaled cast (x.5 boundaries exact in double):
        # rates are rationals of exact integers, brier is an exact
        # integer ratio — both engines agree on the double, and the
        # scaled-round agrees at every boundary
        s = F.lit(float(10 ** round_digits))
        return F.round(c * s) / s

    return agg.select(
        "n",
        "tp",
        "fp",
        "tn",
        "fn",
        rnd(acc).alias("accuracy"),
        rnd(prec).alias("precision"),
        rnd(rec).alias("recall"),
        rnd(f1).alias("f1"),
        rnd(brier).alias("brier"),
        (
            F.round(logloss, round_digits)
            if round_digits is not None
            else logloss
        ).alias("logloss"),
    )
