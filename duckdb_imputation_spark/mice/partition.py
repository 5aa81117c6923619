"""Missingness bookkeeping for MICE — the Spark equivalent of the
reference's physical partition tables.

The reference materializes `<t>_complete*` tables keyed by per-row null
count (imputation/algorithms/partition.cpp:39-280 and partition_inverse
:295-549) because its column-swap storage patch needs physical tables.
DataFrames are immutable, so we keep ONE DataFrame with

  * ``<col>__isnull`` boolean flags (init_baseline, partition.cpp:671-719),
  * mean/mode pre-filled values (AVG/MODE stats, partition.cpp:43-57),
  * an ``__n_nulls`` column (count_n_nulls, partition.cpp:9-32),

range-partitioned by ``__n_nulls`` and cached — filters on the flag
columns then prune cached batches instead of reading physical partitions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_stats", "flag_and_fill", "null_flag", "inject_nulls"]


def inject_nulls(
    df: DataFrame, cols: Sequence[str], fraction: float, seed: int = 42
) -> DataFrame:
    """Null out a random ``fraction`` of each listed column — the
    reference's experiment sampler (extract_sample, main.cpp:14-38),
    seeded ``rand`` instead of Fisher–Yates so it stays distributed."""
    out = df
    for idx, c in enumerate(cols):
        mask = F.rand(seed + idx) < fraction
        out = out.withColumn(c, F.when(mask, None).otherwise(F.col(c)))
    return out


def null_flag(col: str) -> str:
    return f"{col}__isnull"


def column_stats(
    df: DataFrame, cont_cols: Sequence[str], cat_cols: Sequence[str]
) -> dict[str, float | int]:
    """Mean of each continuous column and mode of each categorical column
    (single pass for means; modes tie-break on the smaller value)."""
    stats: dict[str, float | int] = {}
    if cont_cols:
        row = df.agg(
            *[F.avg(F.col(c).cast("double")).alias(c) for c in cont_cols]
        ).collect()[0]
        for c in cont_cols:
            stats[c] = float(row[c]) if row[c] is not None else 0.0
    for c in cat_cols:
        top = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .count()
            .orderBy(F.desc("count"), F.col(c))
            .first()
        )
        stats[c] = int(top[c]) if top is not None else 0
    return stats


def flag_and_fill(
    df: DataFrame,
    cont_nulls: Sequence[str],
    cat_nulls: Sequence[str],
    stats: dict[str, float | int],
    partition: bool = False,
) -> DataFrame:
    """Add ``<col>__isnull`` flags, fill missing values with mean/mode, and
    add ``__n_nulls``.

    ``partition=True`` additionally range-partitions by ``__n_nulls``
    (the reference's ORDER BY n_nulls clustering, partition.cpp:71) —
    OFF by default after measurement: ``__n_nulls`` has at most
    n_nullable+1 distinct values, so the range exchange collapses the
    corpus into that many partitions (measured: 600k rows → TWO
    partitions) and every downstream MICE scan loses cluster
    parallelism, while the clustering buys nothing without a cache
    (Spark cannot partition-prune a checkpointed frame on a filter).
    Enable it only for a frame that will be ``.cache()``d and scanned
    by ``__n_nulls`` filters many times."""
    null_cols = list(cont_nulls) + list(cat_nulls)
    out = df
    for c in null_cols:
        out = out.withColumn(null_flag(c), F.col(c).isNull())
    if null_cols:
        out = out.withColumn(
            "__n_nulls",
            sum(F.col(null_flag(c)).cast("int") for c in null_cols),
        )
    for c in cont_nulls:
        out = out.withColumn(
            c,
            F.coalesce(F.col(c).cast("double"), F.lit(float(stats[c]))),
        )
    for c in cat_nulls:
        out = out.withColumn(
            c, F.coalesce(F.col(c).cast("int"), F.lit(int(stats[c])))
        )
    if partition and null_cols:
        out = out.repartitionByRange("__n_nulls")
    return out
