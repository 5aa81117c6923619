"""Table profiling — the DuckDB ``SUMMARIZE`` surface, Spark-first.

DuckDB users lean on ``SUMMARIZE t`` for instant per-column
statistics (count, nulls, distincts, min/max, mean/std, quartiles).
The Spark-native translation is NOT per-column queries (k scans) and
NOT a driver loop: it is ONE wide aggregation — every column's
statistics as sibling aggregate expressions in a single partial+final
pass over ONE scan (verified on the executed plan: one FileScan, zero
joins, for any column count; Catalyst folds the per-column exact
COUNT(DISTINCT) family into the same pass via Expand) — followed by
an unpivot of the single result row into (column, stats...) rows.
``exact_distinct=False`` swaps the distinct counts for HyperLogLog
``approx_count_distinct``, trading exactness for the Expand's
per-distinct-column row multiplication — the right profile at corpus
scale; the exact default is the oracle surface.

Cross-engine determinism notes (the oracle discipline):

* quantiles use Spark's EXACT ``percentile`` (linear interpolation),
  which matches DuckDB's ``quantile_cont`` definition bit-for-bit on
  the same multiset;
* ``n_distinct`` is exact (``count_distinct``) — the profile is a
  correctness surface here, approximate profiling at corpus scale is
  :func:`..operators.sketches.distinct_sketch`'s job;
* min/max are emitted as strings (mixed column types share one
  schema, the SUMMARIZE convention) — numeric formatting is
  normalized through a float cast with explicit rounding on both
  engines;
* mean/std/quantile cells are second-moment-class statistics — the
  catalog row rounds them at the repo's ROUND(,4)+0.0 tier
  (oracle_margin.py's stat-class rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column statistics as rows:

    (column, count, n_null, n_distinct, min_value, max_value,
     mean, std, q25, q50, q75)

    ``min_value``/``max_value`` are strings for every column type;
    mean/std/quartiles are NULL for non-numeric columns.  One
    aggregation pass over one scan; the unpivot runs on the single
    aggregated row."""
    names = list(cols) if cols is not None else list(df.columns)
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in names:
        col = F.col(c)
        is_num = isinstance(fields[c], _NUMERIC)
        aggs.append(F.count(col).alias(f"__cnt_{c}"))
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nul_{c}"))
        nd = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs.append(nd.alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
        if is_num:
            d = col.cast("double")
            aggs.append(F.avg(d).alias(f"__avg_{c}"))
            aggs.append(F.stddev_pop(d).alias(f"__std_{c}"))
            aggs.append(
                F.expr(f"percentile({c}, array(0.25, 0.5, 0.75))").alias(
                    f"__q_{c}"
                )
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__avg_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__std_{c}"))
            aggs.append(
                F.lit(None).cast("array<double>").alias(f"__q_{c}")
            )
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__cnt_{c}").cast("long").alias("count"),
            F.col(f"__nul_{c}").cast("long").alias("n_null"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
            F.col(f"__avg_{c}").alias("mean"),
            F.col(f"__std_{c}").alias("std"),
            F.element_at(f"__q_{c}", 1).alias("q25"),
            F.element_at(f"__q_{c}", 2).alias("q50"),
            F.element_at(f"__q_{c}", 3).alias("q75"),
        )
        for c in names
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("__p")
    ).select("__p.*")
