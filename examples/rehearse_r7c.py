#!/usr/bin/env python
"""Scale rehearsal for the round-7 LATE operators at the 10x replica
(same method as rehearse_r7b.py: warm best-of-2, local[32]):

* bottomk_grouped_documents — output is |groups| x k regardless of
  corpus size; the per-group window moves each group's rows once.
* global_ranking_quantity — four shard-offset passes over the value
  column; tie-class frame stays 50 rows at any SF.
* retention_cohorts_events — (user, day) dedup bounds everything
  downstream; the replica multiplies events 10x but users/days less.
* sliding_window_events — 2x row multiplication before one keyed agg.
* robust_outliers_lineitem — two grouped EXACT-percentile aggregates;
  the group count stays 3, so per-group value buffers grow 10x (the
  documented exact-mode bound; approx mode is the corpus path).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from duckdb_imputation_spark.queries import QUERIES  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.data/sf1")

OPS = [
    "bottomk_grouped_documents",
    "global_ranking_quantity",
    "retention_cohorts_events",
    "sliding_window_events",
    "robust_outliers_lineitem",
]


def time_query(spark, name: str, sf: str, repeats: int = 2):
    best = float("inf")
    rows = None
    for _ in range(repeats):
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf)
        rows = df.count()
        best = min(best, time.monotonic() - t0)
    return best, rows


def main() -> None:
    spark = get_spark("rehearse-r7c")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF01}/region.parquet").count()
    print(
        f"{'op':42s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s} "
        f"{'rows0.1':>9s} {'rows1':>9s}",
        flush=True,
    )
    for name in OPS:
        t_small, r_small = time_query(spark, name, SF01)
        t_big, r_big = time_query(spark, name, SF1)
        print(
            f"{name:42s} {t_small:8.2f} {t_big:8.2f} "
            f"{t_big / t_small:5.1f}x {r_small:9d} {r_big:9d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
