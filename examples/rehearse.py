#!/usr/bin/env python
"""THE scale-rehearsal harness (VERDICT r8 #7: one parameterized entry
point instead of a per-round script) — measures catalog rows and named
custom cases at sf0.1 vs the 10x replica (warm best-of-N, local[32]),
printing wall, ratio and row counts, the PLANS_r* rehearsal-table
format.

    python examples/rehearse.py --ops mice_recovery_rmse ewma_events
    python examples/rehearse.py --special triple_join_broadcast \
                                --special triple_join_shuffle --explain
    python examples/rehearse.py --ops containment_join_documents \
                                --repeats 3

``--ops`` names are catalog rows (duckdb_imputation_spark.queries);
``--special`` names come from the CASES registry below (variants that
need knobs a catalog row does not expose — capped fuzzy joins,
broadcast-vs-shuffle factorized joins).  ``--explain`` additionally
prints the executed plan's exchange/broadcast node counts at sf0.1 —
the measurement VERDICT r8 #5 asked for.

The 10x replica is built once by examples/make_sf1.py (fact tables
replicated with consistently shifted keys, dims as-is: per-row operator
cost matches sf0.1, only volume grows).

CAVEAT — rows that materialize at construction: availableNow catalog
rows run their stream INSIDE the row callable (awaitTermination at
construction) and return a read of the sink, and rows whose operator
pins a reused frame with an EAGER localCheckpoint (multiclass report,
MICE) do their corpus pass at construction too — ``_timed`` calls
``mk()`` outside the timer, so it measures only the downstream read.
Time such rows end-to-end manually (t0 → fn(spark, sf).count() → dt);
the r10 funnel-stream and multiclass numbers in PLANS_r13.md were
taken that way.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF01 = os.environ.get("SPARK_GRAFT_REHEARSE_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.data/sf1")


def _triple_supplier_join(spark, sf: str, broadcast_right: bool):
    """Factorized cofactor over the lineitem ⋈ supplier DIM join — the
    broadcast_right showcase: the grouped right side is |suppliers|
    rows (1k at sf0.1), exactly the dim-sized-key case the knob is
    documented for (operators/multiply.py triple_over_join)."""
    from duckdb_imputation_spark.operators.flatten import flatten_triple
    from duckdb_imputation_spark.operators.multiply import triple_over_join
    from duckdb_imputation_spark.sources import load_table

    from pyspark.sql import functions as F

    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_acctbal").cast("double").alias("s_bal"),
        F.col("s_nationkey").cast("int").alias("s_nat"),
    )
    t = triple_over_join(
        li, s, on="l_suppkey",
        num1=["l_quantity"], cat1=["l_linenumber"],
        num2=["s_bal"], cat2=["s_nat"],
        broadcast_right=broadcast_right,
    )
    return flatten_triple(t, 2, 2)


def _fuzzy_pairs(spark, sf: str, max_block):
    from duckdb_imputation_spark.operators.fuzzyjoin import fuzzy_self_pairs
    from duckdb_imputation_spark.sources import load_table

    c = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    return fuzzy_self_pairs(
        c, "c_custkey", "c_name", max_distance=1, max_block=max_block
    )


def _minhash_after_exact_dedup(spark, sf: str):
    """The PIPELINE-ORDER RULE measured (SCALING.md, fuzzy-join row):
    exact-dedup FIRST collapses duplication multiplicity, so the
    near-dup verify join never sees the quadratic pair blow-up a
    duplication-heavy corpus (like the Nx replicas, every doc copied
    Nx) would otherwise hand it.  Without this, the 100x replica's
    ~25M true pairs put >100 GB of shingle arrays through the verify
    join's shuffle — correct, but a resource bill the pipeline order
    makes unnecessary."""
    from duckdb_imputation_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup,
    )
    from duckdb_imputation_spark.sources import load_table

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    exact = exact_dedup(d, "text", "doc_id")
    return minhash_dedup(
        exact, "text", "doc_id", k=16, bands=4, shingle=5, threshold=0.5
    )


def _funnel_timing(spark, sf: str, exact: bool):
    """The funnel_timing_events recipe with the exact/approx knob — the
    r11 rehearsal pair: exact percentile buffers the reached cohort's
    deltas per aggregation state, approx (GK) keeps state bounded."""
    from duckdb_imputation_spark.operators.funnel import funnel_timing
    from duckdb_imputation_spark.sources import load_table

    ev = load_table(spark, sf, "events")
    return funnel_timing(
        ev, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], exact=exact,
    )


def _window_funnel(spark, sf: str, cap):
    """The window_funnel_events recipe with the hot-user anchor cap."""
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.funnel import window_funnel
    from duckdb_imputation_spark.sources import load_table

    ev = load_table(spark, sf, "events")
    out = window_funnel(
        ev, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], within=28800.0,
        max_anchors_per_user=cap,
    )
    return out.groupBy("depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# name -> fn(spark, sf_dir) -> DataFrame
CASES = {
    "triple_join_broadcast": lambda sp, sf: _triple_supplier_join(sp, sf, True),
    "triple_join_shuffle": lambda sp, sf: _triple_supplier_join(sp, sf, False),
    "fuzzy_self_pairs_uncapped": lambda sp, sf: _fuzzy_pairs(sp, sf, None),
    "fuzzy_self_pairs_cap20": lambda sp, sf: _fuzzy_pairs(sp, sf, 20),
    "minhash_after_exact_dedup": _minhash_after_exact_dedup,
    "funnel_timing_exact": lambda sp, sf: _funnel_timing(sp, sf, True),
    "funnel_timing_approx": lambda sp, sf: _funnel_timing(sp, sf, False),
    "window_funnel_uncapped": lambda sp, sf: _window_funnel(sp, sf, None),
    "window_funnel_cap8": lambda sp, sf: _window_funnel(sp, sf, 8),
}


def _timed(mk, repeats: int):
    """Time the FULL computation via the noop sink — a bare count()
    lets Catalyst prune projection-shaped work (a per-row expression
    pipeline collapses to a parquet metadata count and the rehearsal
    measures nothing; caught live in r9 when 500k docs 'tokenized' in
    0.45 s).  Row count is taken once, outside the timing."""
    best = float("inf")
    df = mk()
    rows = df.count()
    for _ in range(repeats):
        df = mk()
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best, rows


def _plan_counts(df) -> str:
    df.count()  # AQE: final plan only exists after an action
    plan = df._jdf.queryExecution().executedPlan().toString()
    ex = plan.count("Exchange")
    bhj = plan.count("BroadcastHashJoin")
    bex = plan.count("BroadcastExchange")
    return f"exchanges={ex} (broadcast={bex}) bhj={bhj}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", nargs="*", default=[],
                    help="catalog row names (queries.py registrations)")
    ap.add_argument("--special", action="append", default=[],
                    choices=sorted(CASES), help="custom CASES entries")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", action="store_true",
                    help="print executed-plan exchange counts at sf0.1")
    ap.add_argument("--skip-sf1", action="store_true",
                    help="only measure sf0.1 (no replica run)")
    args = ap.parse_args()

    from duckdb_imputation_spark.queries import QUERIES
    from duckdb_imputation_spark.session import get_spark

    spark = get_spark("rehearse")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF01}/region.parquet").count()  # JVM warm

    todo: list[tuple[str, object]] = [
        (n, QUERIES[n]) for n in args.ops
    ] + [(n, CASES[n]) for n in args.special]
    if not todo:
        ap.error("nothing to rehearse: pass --ops and/or --special")

    print(f"{'case':44s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s} "
          f"{'rows0.1':>10s} {'rows1':>10s}", flush=True)
    for name, fn in todo:
        t_s, r_s = _timed(lambda: fn(spark, SF01), args.repeats)
        if args.skip_sf1:
            print(f"{name:44s} {t_s:8.2f} {'-':>8s} {'-':>7s} "
                  f"{r_s:10d} {'-':>10s}", flush=True)
        else:
            t_b, r_b = _timed(lambda: fn(spark, SF1), args.repeats)
            print(f"{name:44s} {t_s:8.2f} {t_b:8.2f} {t_b / t_s:6.1f}x "
                  f"{r_s:10d} {r_b:10d}", flush=True)
        if args.explain:
            print(f"  plan@sf0.1: {_plan_counts(fn(spark, SF01))}",
                  flush=True)


if __name__ == "__main__":
    main()
