"""Streaming PSI — live distribution-drift monitoring against a
frozen reference histogram.

The deployment shape of :func:`..operators.selection.psi_drift`: a
metric stream is bucketed by the SAME fixed edges as the reference
(integer comparisons, zero float boundary), counted per event-time
window under a watermark — ALL built-in streaming operators, no custom
state — and the windowed bucket counts feed
:func:`..operators.selection.psi_vs_reference` batch-side (or in a
foreachBatch) to score each window's drift.  Splitting counting
(streaming, stateful, bounded at |windows| × B cells) from scoring
(a tiny deterministic fold over B rows per window) keeps the
streaming query trivially checkpointable and the PSI math in exactly
one place.

State is the windowed aggregation's: |open windows| × (B+1) counters
— independent of the stream length; the watermark bounds open
windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_psi_counts"]


def streaming_psi_counts(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    bin_edges: list[float],
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked per-window bucket counts over the PSI bin edges:
    returns (window_start, bucket, n) — the streaming half of the PSI
    monitor.  Bucket = Σ (v ≥ edge), the same pure-integer assignment
    as the batch operator; NULL values are dropped (they are not a
    magnitude)."""
    v = F.col(value_col).cast("double")
    bucket = F.lit(0)
    for e in bin_edges:
        bucket = bucket + (v >= F.lit(float(e))).cast("int")
    src = stream.where(v.isNotNull()).select(
        F.col(ts_col).cast("timestamp").alias("__ts"),
        bucket.alias("bucket"),
    )
    return (
        src.withWatermark("__ts", watermark)
        .groupBy(F.window("__ts", window).alias("__w"), "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("__w.start").alias("window_start"),
            "bucket",
            "n",
        )
    )
