"""As-of join — match each left row to the latest right row at or before
its timestamp, per key.

Spark has no native ASOF JOIN; the naive formulation (range theta-join)
explodes.  This implementation is the scalable union-marker pattern:

    1. tag both inputs and UNION them (no join at all),
    2. one window sort per key over the merged stream,
    3. ``last(right_value, ignoreNulls=True)`` carries the most recent
       right row forward onto each left row.

Cost: ONE shuffle on the key (the window), linear in |L| + |R| — the
standard streaming-merge formulation, versus the quadratic range join.
Ties (equal timestamps) take the right row, matching DuckDB's
``ASOF JOIN`` (the oracle used in the query catalog).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["as_of_join"]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left rows + the latest right row with ``right_ts <= left_ts`` per
    key; right columns are NULL when nothing precedes (or the match is
    older than ``tolerance_seconds``)."""
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    right_cols = list(right_cols)

    lhs = left.withColumn("__t", F.col(left_ts).cast("timestamp")).withColumn(
        "__is_left", F.lit(1)
    )
    for c in right_cols:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    lhs = lhs.withColumn("__rts", F.lit(None).cast("timestamp"))

    rhs = right.select(
        *keys,
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).cast("timestamp").alias("__rts"),
    )
    left_payload = [c for c in left.columns]
    merged = lhs.select(
        *left_payload, "__t", "__is_left", *[f"__r_{c}" for c in right_cols], "__rts"
    ).unionByName(
        rhs.select(
            *[
                F.col(k) if k in keys else F.lit(None).cast(dict(lhs.dtypes)[k]).alias(k)
                for k in left_payload
            ],
            "__t",
            "__is_left",
            *[f"__r_{c}" for c in right_cols],
            "__rts",
        )
    )
    # right rows sort before left rows at equal timestamps → ties match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        *left_payload,
        "__t",
        "__is_left",
        F.last("__rts", ignorenulls=True).over(w).alias("__m_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_cols
        ],
    ).filter(F.col("__is_left") == 1)

    if tolerance_seconds is not None:
        in_tol = (
            F.col("__t").cast("double") - F.col("__m_ts").cast("double")
            <= float(tolerance_seconds)
        )
        carried = carried.select(
            *left_payload,
            F.when(in_tol, F.col("__m_ts")).alias("__m_ts"),
            *[
                F.when(in_tol, F.col(f"__m_{c}")).alias(f"__m_{c}")
                for c in right_cols
            ],
        )
    return carried.select(
        *left_payload,
        F.col("__m_ts").alias(f"{right_ts}_matched"),
        *[F.col(f"__m_{c}").alias(c) for c in right_cols],
    )
