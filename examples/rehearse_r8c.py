#!/usr/bin/env python
"""Scale rehearsal for the round-8 LATE rows at the 10x replica (warm
best-of-2, local[32]) — same method as rehearse_r8.py:

* heavy_hitter_tokens_by_source — per-(partition, group) MG state; the
  replica multiplies docs 10x with the same 20 sources, so candidates
  stay (partitions x 20 x k)-bounded and phase 2 counts only those.
* scd2_snapshot_events — the chain build (two keyed windows) + a
  prunable interval filter.
* streaming_sessionize_events — applyInPandasWithState sessionizer:
  state one open session per active user; replica multiplies users
  10x, per-user series unchanged.
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
    "heavy_hitter_tokens_by_source",
    "scd2_snapshot_events",
    "streaming_sessionize_events",
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
    spark = get_spark("rehearse-r8c")
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
