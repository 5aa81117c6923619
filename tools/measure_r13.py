#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1: measure first).

Times each headline/bench2 query exactly like bench.py (best-of-N,
warmed, .collect()) and ADDITIONALLY:
  * a noop-sink timing (guide §1.4 — computes every column, no driver
    result transfer) so collect overhead is visible separately,
  * .explain("formatted") captured to plans/r13/<query>_<tag>.txt,
  * per-phase timings for mice_low_2iter (MiceResult.timings).

Usage: python tools/measure_r13.py <tag> [query ...]
  tag = "before" or "after" (plan file suffix); optional query names
  restrict the run.  Prints one JSON line per query to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH2, HEADLINE, SF_DIR, bench_mice  # noqa: E402
from duckdb_imputation_spark.queries import QUERIES  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402

PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("measure_r13")
    sc = spark.sparkContext
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    root = os.path.dirname(SF_DIR.rstrip("/"))
    warm_dir = next(
        (
            os.path.join(root, d)
            for d in ("sf0.001", "sf0.01")
            if os.path.isdir(os.path.join(root, d))
        ),
        SF_DIR,
    )

    results = {}
    names = [n for n in HEADLINE + BENCH2 if not only or n in only]
    for name in names:
        fn = QUERIES[name]
        # warm pass at the small SF (codegen/JIT), never timed
        try:
            sc.setJobDescription(f"warm:{name}")
            fn(spark, warm_dir).collect()
        except Exception:
            pass
        df = fn(spark, SF_DIR)
        # plan capture
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        best_c = best_n = None
        for _ in range(max(repeats, 1)):
            sc.setJobDescription(f"{name}:collect")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            best_c = dt if best_c is None else min(best_c, dt)
        for _ in range(max(repeats, 1)):
            sc.setJobDescription(f"{name}:noop")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best_n = dt if best_n is None else min(best_n, dt)
        sc.setJobDescription(None)
        results[name] = {"collect": round(best_c, 3), "noop": round(best_n, 3)}
        print(json.dumps({"query": name, **results[name]}), flush=True)

    if not only or "mice_low_2iter" in only:
        from duckdb_imputation_spark.mice import mice_impute
        from duckdb_imputation_spark.sources import load_table

        # one warm pass then the timed pass, phase-instrumented
        best = None
        phases = None
        for _ in range(max(repeats, 1)):
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
            sc.setJobDescription("mice_low_2iter")
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
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
                phases = {k: round(v, 3) for k, v in res.timings.items()}
        print(
            json.dumps(
                {"query": "mice_low_2iter", "collect": round(best, 3), "phases": phases}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
