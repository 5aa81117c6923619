"""Slowly-changing-dimension type-2 history maintenance (SCD2) —
versioned dimension/metadata tables for a training-data pipeline
(per-source licensing status, per-domain quality tier, tokenizer
version per corpus slice): every change to a tracked attribute closes
the current version row and opens a new one, so any past state of the
dimension is reconstructable with ``valid_from <= t < valid_to``.

Spark-first shape: ONE window pass over the updates (partitioned by
key — per-key state is the batch's updates for that key, never the
history) + ONE key-equi-join against the CURRENT history slice; closed
history rows pass through untouched (a filter, no shuffle).  No driver
loop, no row-at-a-time Python.

Reference surface: the reference engine has no SCD operator — this is
part of the beyond-reference pipeline family (brief: dedup/similarity/
text-analysis + the operations a large-scale training pipeline needs).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_apply", "scd2_snapshot_at"]


def scd2_apply(
    history: DataFrame | None,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Merge a batch of observations into an SCD2 history table.

    ``history`` rows are (key..., tracked..., valid_from, valid_to)
    with ``valid_to`` NULL marking each key's current version;
    ``None`` means an empty history (initial load).  ``updates`` rows
    are (key..., tracked..., ts_col) — ``ts_col`` must be unique per
    key within the batch and later than the key's current
    ``valid_from`` (out-of-order history rewrites are a different
    operation; this one appends versions).

    Semantics (per key, updates in ``ts_col`` order):

    * an update whose tracked values EQUAL the effective previous
      version (the preceding update in the batch, or the current
      history row for the first update) is a no-op and produces no
      version — consecutive-duplicate collapse;
    * each surviving update closes the previous version at its
      timestamp (``valid_to = ts``) and opens a new one
      (``valid_from = ts``, ``valid_to`` NULL until a later update
      closes it);
    * keys with no surviving update keep their current row unchanged;
      already-closed history rows always pass through untouched.

    NULL tracked values: compared with NULL-safe equality (``<=>``) —
    NULL -> NULL is "unchanged", NULL -> value is a change.  Rows with
    a NULL key or NULL ``ts_col`` are rejected at runtime (history
    identity would be ambiguous).

    Scale shape: the updates frame takes one keyed window (per-key
    batch updates in one task — bounded by the BATCH, not the series:
    history never re-sorts) and one equi-join against the current
    slice (AQE broadcasts whichever side is small); the closed slice
    is a pass-through filter union.  Everything is JVM Column
    expressions."""
    keys = list(key_cols)
    tracked = list(tracked_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if not tracked:
        raise ValueError("tracked_cols must be non-empty")

    guard = F.lit(True)
    for k in keys:
        guard = guard & F.col(k).isNotNull()
    guard = guard & F.col(ts_col).isNotNull()
    upd = updates.select(
        *keys,
        *tracked,
        F.when(
            guard, F.col(ts_col)
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"scd2_apply: NULL in key {keys} or {ts_col} — "
                    "history identity would be ambiguous"
                )
            )
        ).alias("__ts"),
    )

    if history is not None:
        # __has_cur is an explicit presence marker: join-hit detection
        # must NOT ride __cur_from's null-ness, or a current row with a
        # NULL valid_from (the "since the beginning of time" convention)
        # reads as "no current row" and the key double-opens (review r8)
        cur = history.where(F.col(valid_to).isNull()).select(
            *keys,
            *[F.col(c).alias(f"__cur_{c}") for c in tracked],
            F.col(valid_from).alias("__cur_from"),
            F.lit(True).alias("__has_cur"),
        )
        closed = history.where(F.col(valid_to).isNotNull())
    else:
        cur = None
        closed = None

    w = Window.partitionBy(*keys).orderBy("__ts")
    with_prev = upd
    for c in tracked:
        with_prev = with_prev.withColumn(f"__prev_{c}", F.lag(c).over(w))
    with_prev = with_prev.withColumn("__first", F.lag("__ts").over(w).isNull())

    if cur is not None:
        with_prev = with_prev.join(cur, keys, "left")
        # the first batch update compares against the key's current row
        for c in tracked:
            with_prev = with_prev.withColumn(
                f"__prev_{c}",
                F.when(F.col("__first"), F.col(f"__cur_{c}")).otherwise(
                    F.col(f"__prev_{c}")
                ),
            )
        had_current = F.coalesce(F.col("__has_cur"), F.lit(False))
    else:
        had_current = F.lit(False)

    unchanged = F.lit(True)
    for c in tracked:
        unchanged = unchanged & F.col(c).eqNullSafe(F.col(f"__prev_{c}"))
    # the very first version of a NEW key (no current row, no earlier
    # batch update) always survives — there is nothing to equal
    is_change = ~unchanged | (F.col("__first") & ~had_current)
    survivors = with_prev.where(is_change)

    # consecutive-duplicate collapse means the CLOSING timestamp is the
    # next SURVIVING update's ts — a second window over survivors only
    w2 = Window.partitionBy(*keys).orderBy("__ts")
    new_rows = survivors.withColumn("__next_ts", F.lead("__ts").over(w2))
    opened = new_rows.select(
        *keys,
        *tracked,
        F.col("__ts").alias(valid_from),
        F.col("__next_ts").alias(valid_to),
    )

    if cur is None:
        return opened

    # a key's current history row closes at its first SURVIVING
    # update's ts (survivor = change; an unchanged first update was
    # collapsed, and any later survivor differs from the current row
    # transitively); keys with no survivors keep their row open
    first_change = (
        survivors.where(F.coalesce(F.col("__has_cur"), F.lit(False)))
        .groupBy(*keys)
        .agg(F.min("__ts").alias("__close_ts"))
    )
    cur_full = history.where(F.col(valid_to).isNull())
    cur_out = (
        cur_full.join(first_change, keys, "left")
        .withColumn(
            valid_to,
            F.when(
                F.col("__close_ts").isNotNull(), F.col("__close_ts")
            ).otherwise(F.col(valid_to)),
        )
        .drop("__close_ts")
    )
    out_cols = [*keys, *tracked, valid_from, valid_to]
    result = cur_out.select(*out_cols).unionByName(opened.select(*out_cols))
    if closed is not None:
        result = closed.select(*out_cols).unionByName(result)
    return result


def scd2_snapshot_at(
    history: DataFrame,
    at,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """The dimension as it was at time ``at``: rows with
    ``valid_from <= at < valid_to`` (NULL ``valid_to`` = open).  A
    plain filter — partition/Z-order the history on ``valid_from`` and
    this prunes at the scan."""
    a = F.lit(at)
    return history.where(
        (F.col(valid_from) <= a)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > a))
    )
