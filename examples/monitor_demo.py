#!/usr/bin/env python
"""Live model-monitoring demo: the r11 evaluation family end to end.

A deployed purchase scorer is monitored two ways over the events
stream replayed from parquet:

1. INPUT drift — streaming PSI bucket counts against a frozen
   reference histogram (streaming/psi_stream.py);
2. OUTPUT reliability — streaming calibration bin cells per
   event-time window, scored batch-side into reliability diagrams and
   per-window ECE (streaming/eval_stream.py), plus the batch top-label
   and per-class calibration views over the same scores.

Usage: python examples/monitor_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.ml.eval import (
        per_class_calibration_ece,
        top_label_calibration_ece,
    )
    from duckdb_imputation_spark.session import get_spark
    from duckdb_imputation_spark.sources import load_table
    from duckdb_imputation_spark.streaming.eval_stream import (
        calibration_ece_from_bins,
        calibration_score_bins,
        streaming_calibration_counts,
    )

    spark = get_spark("monitor-demo")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, SF, "events").where(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    # the deployed "scorer": the deterministic milli probability the
    # calibration catalog row uses (cents mod 1001, scaled)
    v = F.round(F.col("value") * 100).cast("long")
    scored = ev.select(
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        ((v % 1001).cast("double") / 1000.0).alias("p"),
        "event_type",
        "user_id",
        "event_id",
    )

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "scored")
        scored.coalesce(1).write.parquet(src)
        es = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        bins = streaming_calibration_counts(
            es, "y", "p", window="30 days", watermark="1 hour"
        )
        sink = os.path.join(tmp, "bins")
        q = (
            bins.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        cells = spark.read.parquet(sink)
        n_windows = cells.select("window_start").distinct().count()
        print(f"sealed windows: {n_windows}, cells: {cells.count()}")
        diagram = calibration_score_bins(cells, group_cols=[])
        print("merged reliability diagram (all sealed windows):")
        for r in sorted(diagram.collect(), key=lambda r: r["bin"]):
            print(
                f"  bin {r['bin']}: n={r['n']:6d}  conf={r['confidence']:.3f}"
                f"  acc={r['accuracy']:.3f}"
            )
        ece = calibration_ece_from_bins(cells, group_cols=[]).collect()[0]
        print(f"global ece over sealed cells: {ece['ece']}")

    # batch multiclass views over the same corpus
    uid, eid = F.col("user_id"), F.col("event_id")
    frame = ev.where(uid.isNotNull() & eid.isNotNull()).select(
        F.col("event_type").alias("label"),
        ((v % 1001).cast("double") / 1000.0).alias("p_view"),
        ((uid % 1001).cast("double") / 1000.0).alias("p_click"),
        ((eid % 1001).cast("double") / 1000.0).alias("p_purchase"),
        (((v + uid) % 1001).cast("double") / 1000.0).alias("p_signup"),
        (((v + eid) % 1001).cast("double") / 1000.0).alias("p_error"),
    )
    cols = ["p_view", "p_click", "p_purchase", "p_signup", "p_error"]
    cls = ["view", "click", "purchase", "signup", "error"]
    tl = top_label_calibration_ece(frame, "label", cols, classes=cls)
    print("top-label ece:", tl.collect()[0]["ece"])
    print("per-class ece:")
    for r in sorted(
        per_class_calibration_ece(frame, "label", cols, classes=cls).collect(),
        key=lambda r: r["class"],
    ):
        print(f"  {r['class']:9s} n={r['n']:6d} ece={r['ece']}")
    print("monitor demo done")
    spark.stop()


if __name__ == "__main__":
    main()
