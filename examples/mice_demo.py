#!/usr/bin/env python
"""End-to-end MICE demo — the Spark analogue of the reference's
main() (imputation/main.cpp:40-81): load a table, inject 20% missing
values into three columns, run MICE, report recovery quality.

The reference demos on iris.csv; this uses the driver's lineitem
parquet with a fabricated linearly-dependent column so recovery quality
is measurable.  Run:  python examples/mice_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from duckdb_imputation_spark.mice import inject_nulls, mice_impute
from duckdb_imputation_spark.session import get_spark
from duckdb_imputation_spark.sources import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("mice-demo")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        (F.col("l_quantity") * 2.0 + F.col("l_linenumber") * 5.0).alias("derived"),
        F.round(F.col("l_discount") * 100).cast("int").alias("disc"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    # carry the ground truth along instead of joining it back
    li = li.withColumn("derived_true", F.col("derived"))
    masked = inject_nulls(li, ["derived"], fraction=0.2, seed=7)
    res = mice_impute(
        masked,
        cont_cols=["derived", "qty"],
        cat_cols=["l_linenumber", "disc"],
        iters=3,
        strategy="low",
        noise=False,
    )
    report = res.df.agg(
        F.sqrt(F.avg((F.col("derived") - F.col("derived_true")) ** 2)).alias("rmse"),
        F.stddev("derived_true").alias("sd"),
    ).collect()[0]
    print(f"MICE-low on {sf_dir}: RMSE {report['rmse']:.4f} "
          f"(column sd {report['sd']:.2f})")
    for phase, sec in res.timings.items():
        print(f"  {phase:>15}: {sec:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
