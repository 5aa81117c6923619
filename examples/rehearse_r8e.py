#!/usr/bin/env python
"""Scale rehearsal for the round-8 EXTENSION rows at the 10x replica
(warm best-of-2, local[32]) — same method as rehearse_r8.py:

* triangle_counts_pages — the page graph is bounded (props keys), so
  the oriented edge list and triangle set are FLAT at 10x events; wall
  should track the navigation-window scan.
* seasonal_anomalies_events — one keyed aggregate + broadcast profile
  join; 10x events -> 10x aggregate input, profile frame still
  |types| x 24.
* pmi_collocations_documents — bigram GROUP BY tracks token volume
  (10x); unigram joins stay vocabulary-sized.
* welch_ttest_events / chi2_type_hour_events — single conditional
  aggregates; strata/cell frames flat at 10x.
* ppr_navigation_seeded — same loop as pagerank over a flat graph;
  wall tracks the edge-extraction scan.
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
    "triangle_counts_pages",
    "seasonal_anomalies_events",
    "pmi_collocations_documents",
    "welch_ttest_events",
    "chi2_type_hour_events",
    "ppr_navigation_seeded",
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
    spark = get_spark("rehearse-r8e")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF01}/region.parquet").count()
    print(
        f"{'op':34s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s} "
        f"{'rows0.1':>9s} {'rows1':>9s}",
        flush=True,
    )
    for name in OPS:
        t_small, r_small = time_query(spark, name, SF01)
        t_big, r_big = time_query(spark, name, SF1)
        print(
            f"{name:34s} {t_small:8.2f} {t_big:8.2f} "
            f"{t_big / t_small:5.1f}x {r_small:9d} {r_big:9d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
