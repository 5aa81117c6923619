#!/usr/bin/env python
"""Scale rehearsal for the round-8 FINAL streaming rows at the 10x
replica (warm best-of-2, local[32]) — same method as rehearse_r8.py:

* streaming_ohlc_rollup_events — rollup-sink state = |touched buckets|;
  the replica multiplies users 10x so bucket count grows ~10x, each
  batch still rewrites only touched buckets.
* streaming_components_events — page graph has ~100 nodes at ANY sf
  (props keys are bounded), so state and deltas are flat; wall should
  track the edge-extraction scan.
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

OPS = ["streaming_ohlc_rollup_events", "streaming_components_events"]


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
    spark = get_spark("rehearse-r8d")
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
