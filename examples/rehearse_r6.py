#!/usr/bin/env python
"""Scale rehearsal for the round-5/6 newest catalog rows (VERDICT r5
item 8): run each op at sf0.1 and at the 10x replica (.data/sf1, built
by examples/make_sf1.py) and print the wall-clock ratio.  A data-bound
op should come in well under 10x (fixed overheads amortize, 32 cores
absorb rows); anything at or past ~10x means per-row cost grew with
volume — a scale smell to investigate.

Ops under rehearsal: BPE Arrow encode, count-min sketch round trip,
snapshot diff, bucketed range join, interval overlap join — the two
places a 10x corpus could surprise are the BPE encode (pandas-UDF batch
shape) and the bucketed joins (bucket-span explode factor).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from duckdb_imputation_spark.queries import QUERIES  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.data/sf1")

OPS = [
    "bpe_encode_documents",
    "cmsketch_token_counts",
    "snapshot_diff_documents",
    "range_join_click_view_window",
    "interval_overlap_view_purchase",
]


def time_query(spark, name: str, sf: str, repeats: int = 2) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    spark = get_spark("rehearse-r6")
    # warm the JVM/codegen paths once
    spark.read.parquet(f"{SF01}/region.parquet").count()
    print(f"{'op':38s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}")
    for name in OPS:
        t_small = time_query(spark, name, SF01)
        t_big = time_query(spark, name, SF1)
        print(
            f"{name:38s} {t_small:8.2f} {t_big:8.2f} "
            f"{t_big / t_small:5.1f}x"
        )


if __name__ == "__main__":
    main()
