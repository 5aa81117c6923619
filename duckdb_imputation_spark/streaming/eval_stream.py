"""Streaming calibration — live reliability monitoring of a deployed
scorer (the model-drift companion to psi_stream: PSI watches the INPUT
distribution, this watches whether predicted probabilities still mean
what they say).

The deployment shape of :func:`..ml.eval.calibration_curve`: scored
events (label, probability) are milli-quantized and binned with the
SAME both-ends-clamped integer bin arithmetic as the batch curve
(`_milli_bin` — zero float boundary), counted per event-time window
under a watermark — ALL built-in streaming operators, no custom state —
and the windowed bin counts feed :func:`calibration_score_bins` /
:func:`calibration_ece_from_bins` batch-side (or in a foreachBatch) to
score each window's reliability and ECE.  The psi_stream
counting/scoring split: streaming state stays |open windows| × n_bins
exact-integer cells, trivially checkpointable, and the calibration
math lives in exactly one place.

The emitted cells (n, n_pos, Σpm) are MERGEABLE SUMMARIES (integer
sums): partial bins from shards, windows, or re-runs add cell-wise —
scoring after any merge is exact, so the same scorers serve
incremental batch audits over stored partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ml.eval import _milli_bin

__all__ = [
    "streaming_calibration_counts",
    "calibration_score_bins",
    "calibration_ece_from_bins",
]


def streaming_calibration_counts(
    stream: DataFrame,
    label_col: str,
    prob_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
    n_bins: int = 10,
) -> DataFrame:
    """Watermarked per-window reliability-bin cells: returns
    (window_start, window_end, bin, n, n_pos, spm) — exact BIGINTs,
    the streaming half of the calibration monitor.  NULL-label or
    NULL-prob rows are dropped (the batch curve's contract)."""
    y = F.col(label_col).cast("double")
    p = F.col(prob_col).cast("double")
    pm = F.round(p * 1000.0).cast("long")
    src = stream.where(
        F.col(label_col).isNotNull() & F.col(prob_col).isNotNull()
    ).select(
        F.col(ts_col).cast("timestamp").alias("__ts"),
        _milli_bin(pm, n_bins).alias("bin"),
        (y == 1.0).cast("long").alias("__pos"),
        pm.alias("__pm"),
    )
    return (
        src.withWatermark("__ts", watermark)
        .groupBy(F.window("__ts", window).alias("__w"), "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__pos").cast("long").alias("n_pos"),
            F.sum("__pm").cast("long").alias("spm"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "bin",
            "n",
            "n_pos",
            "spm",
        )
    )


def _default_groups(bins: DataFrame, group_cols: list[str] | None):
    if group_cols is None:
        return ["window_start"] if "window_start" in bins.columns else []
    return list(group_cols)


def _merged_cells(bins: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cell-wise merge of partial (n, n_pos, spm) bins per
    (group, bin) — exact integer sums, so partials from shards,
    windows, or re-runs compose losslessly."""
    return bins.groupBy(
        *[F.col(c) for c in group_cols], F.col("bin")
    ).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("spm").cast("long").alias("spm"),
    )


def _rnd(c: Column, round_digits: int | None) -> Column:
    if round_digits is None:
        return c
    s = F.lit(float(10 ** round_digits))
    return F.round(c * s) / s


def calibration_score_bins(
    bins: DataFrame,
    group_cols: list[str] | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """Score reliability-bin cells (n, n_pos, spm — the
    streaming_calibration_counts output, or any cell-wise merge of such
    partials): per (group..., bin) exact-rational confidence =
    Σpm/(n·1000) and accuracy = n_pos/n — the batch
    ``calibration_curve`` columns, recovered from mergeable summaries.
    Grouping defaults to ``window_start`` when present (the streaming
    shape); pass ``group_cols=[]`` for one global diagram."""
    groups = _default_groups(bins, group_cols)
    cells = _merged_cells(bins, groups)
    conf = F.col("spm").cast("double") / (
        F.col("n").cast("double") * 1000.0
    )
    acc = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return cells.select(
        *groups,
        "bin",
        "n",
        "n_pos",
        _rnd(conf, round_digits).alias("confidence"),
        _rnd(acc, round_digits).alias("accuracy"),
    )


def calibration_ece_from_bins(
    bins: DataFrame,
    group_cols: list[str] | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """One ECE row per group from the same mergeable cells —
    (group..., n, n_bins_used, ece), the ``calibration_ece`` fold
    recovered from partial bins (exactly equal to running the batch
    fold over the underlying rows, because every input is an exact
    integer sum)."""
    groups = _default_groups(bins, group_cols)
    cells = _merged_cells(bins, groups)
    nb = F.col("n").cast("double")
    term = nb * F.abs(
        F.col("n_pos").cast("double") / nb
        - F.col("spm").cast("double") / (nb * 1000.0)
    )
    grouped = (
        cells.groupBy(*[F.col(c) for c in groups])
        if groups
        else cells.groupBy()
    )
    agg = grouped.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum(term).alias("__t"),
    )
    ece = F.when(
        F.col("n") > 0, F.col("__t") / F.col("n").cast("double")
    )
    return agg.select(
        *groups,
        "n",
        "n_bins_used",
        _rnd(ece, round_digits).alias("ece"),
    )
