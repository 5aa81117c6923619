"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship query on sf0.001 (grouped cofactor, flattened).
``queries``  — every implemented operator from SURVEY §2, one callable
               (spark, sf_dir) -> DataFrame each.
``oracle_sql`` — matching ANSI SQL for the DuckDB oracle harness
               (tables pre-registered as views).  Queries without an
               entry here are non-SQL-expressible and get the weaker
               rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grouped ring-cofactor over lineitem, flattened to entry
    rows (stable flat schema), at sf0.001."""
    from duckdb_imputation_spark.queries import QUERIES

    return QUERIES["triple_lineitem_grouped"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from duckdb_imputation_spark.queries import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """Static oracles plus data-dependent ML oracles (trained-coefficient
    SQL twins) resolved at the driver's sf0.01 gate by default; override
    the training scale with $SPARK_GRAFT_ORACLE_SF_DIR when replaying the
    harness at a different SF."""
    from duckdb_imputation_spark.queries import resolve_oracles

    return resolve_oracles()
