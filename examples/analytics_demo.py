#!/usr/bin/env python
"""End-to-end tour of the round-8 analytics family on one SparkSession:
grouped hypothesis tests, drift screens, feature engineering and hybrid
retrieval — every operator over the driver-provided parquet tables.

Usage: python examples/analytics_demo.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from duckdb_imputation_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics-demo")
    spark.sparkContext.setLogLevel("ERROR")
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.hour("ts").cast("int").alias("hod"),
            F.dayofmonth("ts").alias("dom"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    from duckdb_imputation_spark.operators.stats import (
        anova_oneway,
        benford_profile,
        categorical_entropy,
        chi2_independence,
        mann_whitney_u,
        welch_ttest,
    )

    print("== A/B: Welch t + Mann-Whitney U (click vs purchase, by hour)")
    welch_ttest(
        ev, "event_type", "cents", "click", "purchase", by_cols=["hod"]
    ).orderBy("hod").show(3)
    mann_whitney_u(
        ev, "event_type", "cents", "click", "purchase", by_cols=["hod"]
    ).orderBy("hod").show(3)

    print("== association: chi2 + Cramer's V, ANOVA across all types")
    chi2_independence(ev, "event_type", "hod", effect_size=True).show()
    anova_oneway(ev, "event_type", "cents", by_cols=["hod"]).orderBy(
        "hod"
    ).show(3)

    print("== data quality: Benford screen + type-mix entropy")
    benford_profile(ev, "cents", by_cols=["event_type"]).orderBy(
        "event_type", "digit"
    ).show(5)
    categorical_entropy(ev, "event_type", by_cols=["hod"]).orderBy(
        "hod"
    ).show(3)

    from duckdb_imputation_spark.operators.selection import psi_drift

    print("== drift: PSI first vs second half of month, per type")
    ev2 = ev.withColumn(
        "period", F.when(F.col("dom") <= 15, "p1").otherwise("p2")
    )
    psi_drift(
        ev2, "period", "cents", "p1", "p2",
        [500.0, 1500.0, 3500.0, 7000.0, 15000.0],
        by_cols=["event_type"],
    ).show()

    from duckdb_imputation_spark.operators.features import target_encode

    print("== features: leakage-safe LOO target encoding")
    target_encode(ev, "event_type", "cents", smoothing=50.0, loo=True).show(
        3
    )

    from duckdb_imputation_spark.operators.retrieval import (
        bm25_topk,
        tfidf_keywords,
    )

    print("== retrieval: TF-IDF keywords + BM25 (hybrid-ready heads)")
    tfidf_keywords(docs, "text", "doc_id", k=2, min_df=2).show(4)
    bm25_topk(docs, "text", "doc_id", ["hash", "join"], k=3).show()

    print("analytics demo done")
    spark.stop()


if __name__ == "__main__":
    main()
