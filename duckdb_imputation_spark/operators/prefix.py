"""Distributed prefix sums over a global order — the scale-safe
replacement for ``Window.partitionBy(F.lit(0)).orderBy(...)``.

A single-partition window serializes the whole input through one task
(Spark logs ``WindowExec: No Partition Defined`` and moves ALL data to
one partition) — at 100 TB that is the difference between a running
pipeline and a dead one.  The classic fix is the two-pass shard-offset
prefix sum:

1. shard the rows into order-preserving ranges of the order column
   (boundaries baked as literals, so the assignment is a pure function
   of the row — AQE/retry/replan-proof, unlike ``spark_partition_id``);
2. pass A: per-shard totals of the summed value — one map-side-combined
   aggregation, S rows back to the driver;
3. pass B: per-shard ROWS-frame window prefix sum + the broadcast
   cumulative offset of all lower shards.

The result is bit-identical to the global window for any boundary
placement (equal order keys land in one shard, so even ties behave the
same), while the heavy pass runs with S-way parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["order_preserving_shards", "global_running_sum", "global_row_number"]


def _shard_bounds(df: DataFrame, order_col: str, n_shards: int) -> list[float]:
    """Approximate quantile boundaries of the (numeric) order column.
    Any placement is CORRECT — boundaries only balance work — so the
    cheap sketch (relativeError 0.001, one column-pruned pass) is fine."""
    if n_shards <= 1:
        return []
    qs = [i / n_shards for i in range(1, n_shards)]
    bounds = df.stat.approxQuantile(order_col, qs, 0.001)
    return sorted(set(bounds))


def order_preserving_shards(
    df: DataFrame, order_col: str, n_shards: int
) -> tuple[DataFrame, list[float]]:
    """Attach ``__shard`` — an order-preserving range id of ``order_col``
    (rows with a lower order value never get a higher shard).  The
    boundaries are baked literals: a pure row-local expression, no
    dependence on physical partitioning."""
    bounds = _shard_bounds(df, order_col, n_shards)
    c = F.col(order_col)
    shard: Column = F.lit(0)
    for b in bounds:
        shard = shard + (c > F.lit(b)).cast("int")
    return df.withColumn("__shard", shard), bounds


def _offset_expr(totals: list[tuple[int, int]]) -> Column:
    """Exclusive cumulative offsets per shard, baked as a literal map."""
    offsets: list[Column] = []
    acc = 0
    for shard_id, tot in sorted(totals):
        offsets += [F.lit(int(shard_id)), F.lit(int(acc))]
        acc += int(tot or 0)
    if not offsets:  # empty input
        return F.lit(0).cast("long")
    mapping = F.create_map(*offsets)
    return F.coalesce(
        F.element_at(mapping, F.col("__shard")), F.lit(0)
    ).cast("long")


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    n_shards: int,
    out_col: str = "__running",
    exclusive: bool = False,
) -> DataFrame:
    """Running total of ``value_col`` over the global ``order_col`` order,
    computed with the two-pass shard-offset pattern (module docstring).
    ``exclusive=True`` excludes the current row (the packing form).

    Equal order keys: the ROWS frame makes their relative order within
    the running sum arbitrary — pass a unique order column (same caveat
    as the global-window formulation this replaces)."""
    sharded, _ = order_preserving_shards(df, order_col, n_shards)
    totals = [
        (r["__shard"], r["__tot"])
        for r in sharded.groupBy("__shard")
        .agg(F.sum(value_col).alias("__tot"))
        .collect()
    ]
    offset = _offset_expr(totals)
    w = (
        Window.partitionBy("__shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = offset + F.sum(F.col(value_col)).over(w)
    if exclusive:
        running = running - F.col(value_col)
    return sharded.withColumn(out_col, running.cast("long")).drop("__shard")


def global_row_number(
    df: DataFrame, order_col: str, n_shards: int, out_col: str = "__rn"
) -> DataFrame:
    """row_number() over a global ORDER BY, distributed: per-shard
    row_number + the baked count of all lower shards."""
    sharded, _ = order_preserving_shards(df, order_col, n_shards)
    totals = [
        (r["__shard"], r["__n"])
        for r in sharded.groupBy("__shard")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    ]
    offset = _offset_expr(totals)
    w = Window.partitionBy("__shard").orderBy(order_col)
    return sharded.withColumn(
        out_col, (offset + F.row_number().over(w)).cast("long")
    ).drop("__shard")


def default_n_shards(df: DataFrame) -> int:
    """Shard count for the two-pass prefix ops: the session's shuffle
    parallelism (at 100 TB set n_shards so each shard's rows fit one
    task comfortably — totals stay S driver-side longs either way)."""
    try:
        return max(1, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        return 32
