#!/usr/bin/env python
"""VERDICT r13 #8: re-validate the fused-dense cutover
(cofactor._FUSE_DENSE_MAX, currently 96 = fan x quads) on a quiet box.

Same-session alternating A/B: for each cofactor bench query, force the
fused single-scan branch and the two-scan branch in turn and time the
noop sink (min-of-N).  Both branches are value-identical by
construction; only wall clock differs.  Prints one JSON line per
(query, branch).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_imputation_spark.operators import cofactor as _cf  # noqa: E402
from duckdb_imputation_spark.queries import QUERIES  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))

# (query, fan x quads at its shape) — shapes from queries.py:
#   grouped/full: 3 num x 2 cat -> fan 5, quads 6 -> 30
#   wide: 8 num x 4 cat -> fan 14, quads 36 -> 504
#   nb_triple_orders (nb): 3 num x 2 cat nb -> fan 2, quads 3 -> 6
NAMES = [
    "triple_lineitem_grouped",
    "triple_lineitem_full",
    "triple_lineitem_wide",
    "nb_triple_orders",
]


def main() -> None:
    spark = get_spark("ab_fuse_dense_r14")
    sc = spark.sparkContext
    # warm both branches at the small SF
    for name in NAMES:
        for mx in (10**9, 0):
            _cf._FUSE_DENSE_MAX = mx
            try:
                QUERIES[name](spark, "/root/testdata/sf0.001").collect()
            except Exception:
                pass
    out = {}
    for name in NAMES:
        best = {"fused": None, "twoscan": None}
        for _ in range(REPS):
            for tag, mx in (("fused", 10**9), ("twoscan", 0)):
                _cf._FUSE_DENSE_MAX = mx
                sc.setJobDescription(f"{name}:{tag}")
                t0 = time.perf_counter()
                QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                if best[tag] is None or dt < best[tag]:
                    best[tag] = dt
        _cf._FUSE_DENSE_MAX = 96
        out[name] = {k: round(v, 3) for k, v in best.items()}
        print(json.dumps({"query": name, **out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
