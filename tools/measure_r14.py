#!/usr/bin/env python
"""Optimization-round-2 measurement harness (guide §1: measure first).

Like tools/measure_r13.py but accepts ANY registered query name (not
just the bench lists) — round 14's targets include window rows the
bench does not time.  Times each query exactly like bench.py
(best-of-N, warmed, .collect()) plus a noop-sink timing (guide §1.4),
and captures .explain("formatted") to plans/r14/<query>_<tag>.txt.

Usage: python tools/measure_r14.py <tag> [query ...]
  tag = plan file suffix ("before"/"after"/...); query names default to
  HEADLINE + BENCH2.  Prints one JSON line per query to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH2, HEADLINE, SF_DIR  # noqa: E402
from duckdb_imputation_spark.queries import QUERIES  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (HEADLINE + BENCH2)
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("measure_r14")
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

    for name in names:
        if name == "mice_low_2iter":
            _mice(spark, sc, repeats)
            continue
        fn = QUERIES[name]
        # warm pass at the small SF (codegen/JIT), never timed
        try:
            sc.setJobDescription(f"warm:{name}")
            fn(spark, warm_dir).collect()
        except Exception:
            pass
        df = fn(spark, SF_DIR)
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
        print(
            json.dumps(
                {"query": name, "collect": round(best_c, 3), "noop": round(best_n, 3)}
            ),
            flush=True,
        )
    spark.stop()


def _mice(spark, sc, repeats: int) -> None:
    from duckdb_imputation_spark.mice import mice_impute
    from duckdb_imputation_spark.sources import load_table

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


if __name__ == "__main__":
    main()
