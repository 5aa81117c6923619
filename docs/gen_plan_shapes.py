#!/usr/bin/env python
"""Regenerate tests/plan_shapes_sf0001.json (the plan-shape ratchet
baseline) after an INTENTIONAL plan improvement or a new catalog row.

Usage:
    python docs/gen_plan_shapes.py               # full re-baseline (all rows)
    python docs/gen_plan_shapes.py NAME [NAME..] # refresh only these rows
    python docs/gen_plan_shapes.py --missing     # add rows registered but
                                                 # absent from the snapshot
                                                 # (the late-row drift case,
                                                 # VERDICT r7 #1/#2)

Targeted modes MERGE into the existing snapshot so refreshing one row
never silently re-baselines the exchange ratchet for the other 139.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from duckdb_imputation_spark.plans import plan_shape  # noqa: E402
from duckdb_imputation_spark.queries import QUERIES  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "plan_shapes_sf0001.json"
)


def _shape(spark, name):
    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF)
    df.collect()
    return plan_shape(df)


def main() -> None:
    args = sys.argv[1:]
    existing = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = json.load(f)

    if args == ["--missing"]:
        names = sorted(set(QUERIES) - set(existing))
        if not names:
            print("snapshot already covers the catalog — nothing to do")
            return
    elif args:
        unknown = [n for n in args if n not in QUERIES]
        if unknown:
            raise SystemExit(f"not in the registry: {unknown}")
        names = sorted(args)
    else:
        names = sorted(QUERIES)
        existing = {}  # full re-baseline

    spark = get_spark("gen-plan-shapes")
    for name in names:
        existing[name] = _shape(spark, name)
        print(f"  {name}: {existing[name]}")
    # drop snapshot entries for rows no longer registered
    existing = {k: v for k, v in existing.items() if k in QUERIES}
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=0, sort_keys=True)
    print(f"wrote {OUT} ({len(existing)} queries, {len(names)} refreshed)")


if __name__ == "__main__":
    main()
