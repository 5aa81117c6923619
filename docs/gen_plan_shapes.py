#!/usr/bin/env python
"""Regenerate tests/plan_shapes_sf0001.json (the plan-shape ratchet
baseline) after an INTENTIONAL plan improvement or a new catalog row."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from duckdb_imputation_spark.plans import executed_plan  # noqa: E402
from duckdb_imputation_spark.queries import QUERIES  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("gen-plan-shapes")
    snap = {}
    for name in sorted(QUERIES):
        spark.catalog.clearCache()
        df = QUERIES[name](spark, SF)
        df.collect()
        p = executed_plan(df)
        snap[name] = {
            "exchanges": p.count("Exchange hashpartitioning")
            + p.count("Exchange rangepartitioning"),
            "single_partition": p.count("Exchange SinglePartition"),
            "bnlj": p.count("BroadcastNestedLoopJoin"),
            "row_python": p.count("BatchEvalPython"),
        }
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "plan_shapes_sf0001.json"
    )
    with open(out, "w") as f:
        json.dump(snap, f, indent=0, sort_keys=True)
    print(f"wrote {out} ({len(snap)} queries)")


if __name__ == "__main__":
    main()
