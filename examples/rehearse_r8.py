#!/usr/bin/env python
"""Round-8 scale rehearsal at the 10x replica (warm best-of-2,
local[32]) — two measurements the r7 verdict asked for (#6):

1. The CAPPED fuzzy self-join.  r7 measured the UNCAPPED 83.5x wall at
   10x data and showed it tracks the ~102x TRUE pair output (quadratic
   in duplication multiplicity — the replica duplicates every name
   10x, so every base near-pair becomes 10x10 pairs plus C(10,2)
   same-name pairs).  This rehearsal runs the same join WITH
   ``max_block`` and shows the trade: bounded fan-out (wall tracks the
   SURVIVING blocks, not the hot ones) against the recall it gives up
   (pairs found vs the uncapped count).  The pipeline-order rule
   stands either way: exact-dedup FIRST collapses the multiplicity and
   makes the cap unnecessary on real corpora (SCALING.md, fuzzy join
   row).

2. The streaming half-life EWMA twin (new this round): state is two
   doubles per key, so the 10x replica (10x keys via user_id shifts)
   must scale the wall with DATA, not with any per-key growth — the
   replica's per-key series length is UNCHANGED, so this should track
   scan+shuffle size (~10x at saturated cores, less when overhead
   dominates).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from duckdb_imputation_spark.queries import QUERIES  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402
from duckdb_imputation_spark.sources import load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.data/sf1")


def _fuzzy_pairs(spark, sf: str, max_block: int | None):
    from duckdb_imputation_spark.operators.fuzzyjoin import fuzzy_self_pairs

    c = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    return fuzzy_self_pairs(
        c, "c_custkey", "c_name", max_distance=1, max_block=max_block
    )


def _timed(mk, repeats: int = 2):
    best, rows = float("inf"), None
    for _ in range(repeats):
        t0 = time.monotonic()
        rows = mk().count()
        best = min(best, time.monotonic() - t0)
    return best, rows


def main() -> None:
    spark = get_spark("rehearse-r8")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF01}/region.parquet").count()

    print(f"{'case':48s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s} "
          f"{'rows0.1':>10s} {'rows1':>10s}", flush=True)

    for label, cap in (("fuzzy_self_pairs UNCAPPED", None),
                       ("fuzzy_self_pairs max_block=20", 20)):
        t_s, r_s = _timed(lambda: _fuzzy_pairs(spark, SF01, cap))
        t_b, r_b = _timed(lambda: _fuzzy_pairs(spark, SF1, cap))
        print(f"{label:48s} {t_s:8.2f} {t_b:8.2f} {t_b / t_s:6.1f}x "
              f"{r_s:10d} {r_b:10d}", flush=True)

    name = "ewma_halflife_stream_events"
    t_s, r_s = _timed(lambda: QUERIES[name](spark, SF01))
    t_b, r_b = _timed(lambda: QUERIES[name](spark, SF1))
    print(f"{name:48s} {t_s:8.2f} {t_b:8.2f} {t_b / t_s:6.1f}x "
          f"{r_s:10d} {r_b:10d}", flush=True)


if __name__ == "__main__":
    main()
