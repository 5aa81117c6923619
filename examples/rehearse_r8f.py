#!/usr/bin/env python
"""Scale rehearsal for the round-8 SESSION-F rows at the 10x replica
(warm best-of-2, local[32]) — same method as rehearse_r8.py:

* spearman_qty_price_lineitem — rank dictionaries: quantity has 50
  distinct values at any SF, price-cents is row-sized (the documented
  degenerate case); wall should track the dictionary build + joins.
* mannwhitney_value_events / ks_value_click_view_events — combined
  rank dictionary over ~3.3k distinct cent values; NO join back to
  rows, so 10x events -> 10x GROUP BY input, flat dictionary after.
* anova_value_by_type_events / psi_value_drift_events — pure
  conditional aggregates; strata/cell frames flat at 10x.
* tfidf_keywords_documents — corpus explode + (doc, token) GROUP BY
  track token volume; per-doc window bounded by the longest doc.
* containment_join_documents — gram inverted-index join; pair output
  tracks true near-containment pairs (duplication-multiplicity
  quadratic, the fuzzy-join reading).
* lpa_communities_navigation — flat 100-node page graph; wall tracks
  the edge-extraction scan, pagerank's profile.
* weighted_sample_by_source_documents — one per-group window; output
  |sources| x 5 at any SF.
* source_overlap_documents — vocabulary self-join; pair frame flat at
  |sources|^2/2, wall tracks the (domain, token) GROUP BY.
* streaming_heavy_hitters_tokens — two availableNow runs + the batch
  exactness pass; state <= k counters throughout.
* moments_value_by_type_events — one aggregate, five doubles/stratum.
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
    "spearman_qty_price_lineitem",
    "mannwhitney_value_events",
    "ks_value_click_view_events",
    "anova_value_by_type_events",
    "psi_value_drift_events",
    "tfidf_keywords_documents",
    "containment_join_documents",
    "lpa_communities_navigation",
    "weighted_sample_by_source_documents",
    "source_overlap_documents",
    "streaming_heavy_hitters_tokens",
    "moments_value_by_type_events",
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
    spark = get_spark("rehearse-r8f")
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
