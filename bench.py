#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from duckdb_imputation_spark.mice import mice_impute
from duckdb_imputation_spark.queries import QUERIES
from duckdb_imputation_spark.session import get_spark
from duckdb_imputation_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "triple_lineitem_grouped",
    "triple_lineitem_wide",
    "triple_lineitem_full",
    "triple_factorized_join",
    "nb_triple_orders",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "orders_window_top3",
    "rolling_customer_spend",
    "asof_join_click_to_view",
    # training-data pipeline ops
    "text_stats_documents",
    "pack_documents_bins",
    "minhash_dedup_survivors",
    "simhash_documents",
    "embedding_cosine_scores",
    "sessionize_events",
    "rollup_lineitem",
]

# Second stamped group (VERDICT r9 #3): one representative per family
# added after the legacy set froze at r2 — tracked with the SAME
# methodology (best-of-N, warmed) but totalled SEPARATELY so the
# legacy total stays comparable to the frozen r4 baseline row.
# BASELINE.md freezes the first green numbers as the family gate.
BENCH2 = [
    "validate_lineitem_constraints",  # declarative validation
    "auc_value_purchase_events",      # rank-dictionary AUC
    "ks_value_click_view_events",     # rank-dictionary hypothesis test
    "quality_classifier_documents",   # weak-label logreg distillation
    "funnel_view_click_purchase_events",  # ordered funnel
    "pagerank_navigation",            # graph family
]


def bench_mice(spark) -> float:
    """MICE-low, 2 iters, 2 null columns over lineitem (deterministic mask)."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.dayofmonth("l_shipdate").cast("double").alias("x"),
        F.when(F.col("l_orderkey") % 5 == 0, None)
        .otherwise(F.col("l_quantity"))
        .alias("y"),
        F.when(F.col("l_orderkey") % 7 == 0, None)
        .otherwise(F.round(F.col("l_discount") * 100))
        .alias("z"),
    )
    t0 = time.perf_counter()
    res = mice_impute(
        li,
        cont_cols=["y", "z", "x"],
        cat_cols=["l_linenumber"],
        cont_nulls=["y", "z"],
        cat_nulls=[],
        iters=2,
        strategy="low",
        noise=False,
    )
    res.df.select(F.count(F.lit(1))).collect()
    return time.perf_counter() - t0


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    spark = get_spark("bench")
    # Warm up JVM / codegen / parquet footer caches before timing: the
    # baseline numbers are warm-path, so timing cold JIT would compare
    # apples to oranges.  One untimed pass of the heaviest machinery at
    # the smallest scale factor compiles the cofactor/flatten codegen
    # paths for ~1 s.
    load_table(spark, SF_DIR, "region").count()
    # Warm-up runs at the smallest sibling scale factor of SF_DIR so it
    # tracks wherever the testdata root lives; falls back to SF_DIR itself.
    root = os.path.dirname(SF_DIR.rstrip("/"))
    warm_dir = next(
        (
            os.path.join(root, d)
            for d in ("sf0.001", "sf0.01")
            if os.path.isdir(os.path.join(root, d))
        ),
        SF_DIR,
    )
    warmed = True
    try:
        QUERIES["triple_factorized_join"](spark, warm_dir).collect()
    except Exception as ex:  # warm-up must never fail the bench
        warmed = False
        print(f"bench: warm-up pass failed ({ex!r:.200}) — "
              "timings include cold-JIT noise", file=sys.stderr)

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = None
        try:
            for _ in range(max(repeats, 1)):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 3)
        except Exception as ex:  # one broken query must not kill the run
            errors[name] = str(ex)[:200]

    try:
        times["mice_low_2iter"] = round(bench_mice(spark), 3)
    except Exception as ex:
        errors["mice_low_2iter"] = str(ex)[:200]

    # bench2: same discipline — one untimed warm pass per query at the
    # smallest sibling SF (compiles each family's codegen path), then
    # best-of-N at SF_DIR
    times2: dict[str, float] = {}
    for name in BENCH2:
        fn = QUERIES[name]
        try:
            fn(spark, warm_dir).collect()
        except Exception:
            pass  # cold-JIT noise only; the timed run reports real errors
        best = None
        try:
            for _ in range(max(repeats, 1)):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times2[name] = round(best, 3)
        except Exception as ex:
            errors[name] = str(ex)[:200]

    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        # methodology stamp — cross-round comparisons need these
        "repeats": max(repeats, 1),
        "warmed": warmed,
        # second stamped group (post-r2 families), totalled separately
        # so "value" stays comparable to the frozen r4 baseline row
        "queries2": times2,
        "value2": round(sum(times2.values()), 3),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
