"""Physical-plan inspection helpers — the ".explain and iterate" loop.

Used by perf tests to assert the plans we designed for actually hold:
filters and projections reach the parquet scan, aggregates keep their
partial (map-side) phase, small dimensions broadcast.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "executed_plan",
    "count_exchanges",
    "count_hash_aggregates",
    "read_schema",
    "pushed_filters",
    "has_broadcast_join",
]


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (each is a full network
    round of the data below it — the unit of scale cost)."""
    return executed_plan(df).count("Exchange hashpartitioning") + executed_plan(
        df
    ).count("Exchange rangepartitioning")


def count_hash_aggregates(df: DataFrame) -> int:
    return executed_plan(df).count("HashAggregate")


def read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        cols.extend(
            fld.split(":")[0].strip() for fld in m.group(1).split(",") if fld
        )
    return cols


def pushed_filters(df: DataFrame) -> str:
    m = re.search(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))
    return m.group(1) if m else ""


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)
