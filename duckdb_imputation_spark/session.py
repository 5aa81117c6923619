"""SparkSession helper with the configuration this engine is designed for.

Local testing runs ``local[N]``; the same settings are what we would set on
a real cluster (AQE on, skew-join handling, Arrow for the few pandas-UDF
paths).  ``spark.sql.shuffle.partitions`` is sized for the local harness;
on a 1000-executor cluster AQE coalescing makes the static value a ceiling,
not a constant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "duckdb_imputation_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Broadcast joins from MEASURED sizes only (r9 100x rehearsal):
        # static size estimates lie badly on exploded/computed columns
        # (shingle arrays, deletion variants), the static planner locks
        # BroadcastHashJoin from those estimates before AQE ever
        # measures, and AQE cannot demote a statically-planned
        # broadcast — at 100x the driver died building a ~25M-row
        # "small" side.  Static threshold off; AQE promotes shuffled
        # joins to broadcast from actual shuffle sizes; explicit
        # F.broadcast() hints (our deliberate dim-side broadcasts)
        # are unaffected.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760b")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
