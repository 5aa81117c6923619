#!/usr/bin/env python
"""Scale rehearsal for the ROUND-7 operators at the 10x replica —
written the round they land, not a round later:

* fuzzy_pairs_customer_names — the replica DUPLICATES every customer
  name 10x, so variant blocks go hot exactly the way a real corpus
  with heavy exact duplication would: candidate pairs grow ~100x
  (10x10 per base near-pair + C(10,2) same-name pairs per name).
  The measurement shows what the blocked join does under that
  adversarial (but realistic) blow-up.
* heavy_hitter_tokens — 10x stream through bounded MG state; the
  candidate set and phase-2 broadcast must stay flat.
* gopher_rules_documents — narrow one-pass; should track scan size.
* dsir_bucketed_importance_weights — the whole point: the 64-row
  model is corpus-size-independent.
* connected_components_alternating_pages — star rounds at 10x edges.
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
    "gopher_rules_documents",
    "heavy_hitter_tokens",
    "dsir_bucketed_importance_weights",
    "fuzzy_pairs_customer_names",
    "connected_components_alternating_pages",
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
    spark = get_spark("rehearse-r7b")
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
