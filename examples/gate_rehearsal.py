#!/usr/bin/env python
"""Driver-gate rehearsal: run the FIRST-50 window exactly the way the
correctness harness does — every query at sf0.01, its DuckDB oracle
side by side, rows + schema + value comparison under the driver's
canonicalization (sort by EVERY column; scalar columns only).  Run
before a round ends to catch gate surprises locally.

Usage: python examples/gate_rehearsal.py [sf_dir] [n_rows]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    # the driver sorts by every column RAW (this is what dies on
    # arrays) — no stringification here on purpose
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> None:
    spark = get_spark("gate-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    window = list(queries)[:N]
    n_pass = n_fail = 0
    lint_bad: list[str] = []
    from duckdb_imputation_spark.plans import lint_plan

    for name in window:
        try:
            df = queries[name](spark, SF)
            if [f for f in lint_plan(df) if f.severity == "error"]:
                lint_bad.append(name)
            got = canon(df.toPandas())
            if name not in oracles:
                print(f"ROWS-ONLY {name}: {len(got)} rows", flush=True)
                n_pass += 1
                continue
            exp = canon(con.execute(oracles[name]).df())
            ok = len(got) == len(exp) and list(got.columns) == list(
                exp.columns
            )
            if ok:
                for c in got.columns:
                    g = got[c].to_numpy()
                    e = exp[c].to_numpy()
                    if pd.api.types.is_float_dtype(got[c]):
                        ok = ok and np.array_equal(g, e, equal_nan=True)
                    else:
                        ok = ok and got[c].astype(str).equals(
                            exp[c].astype(str)
                        )
            status = "PASS" if ok else "FAIL"
            n_pass += ok
            n_fail += not ok
            print(f"{status} {name}: {len(got)} rows", flush=True)
        except Exception as ex:  # gate-visible error — report, continue
            n_fail += 1
            print(f"ERR  {name}: {str(ex)[:160]}", flush=True)
    # static rounding-boundary margin check (VERDICT r6 #1b): a
    # rehearsal replay cannot catch boundary-fragile rounded cells
    # (they are flaky, not deterministic) — the margin rule can
    from duckdb_imputation_spark.oracle_margin import check_window

    n_fragile = 0
    for rep in check_window(oracles, SF, names=window):
        if rep.flags:
            n_fragile += 1
            worst = min(rep.flags, key=lambda f: f.distance)
            print(
                f"FRAGILE {rep.name}: {len(rep.flags)} cell(s), worst "
                f"{worst.column}={worst.value:.9e} sits {worst.distance:.2e} "
                f"from its ROUND(,{worst.tier}) boundary "
                f"(budget {worst.budget:.2e})",
                flush=True,
            )
        elif rep.note.startswith("ERROR"):
            n_fragile += 1
            print(f"FRAGILE {rep.name}: {rep.note}", flush=True)
    print(
        f"\n{n_pass}/{len(window)} green, {n_fail} red, "
        f"{n_fragile} boundary-fragile, "
        f"lint errors: {lint_bad or 'none'}",
        flush=True,
    )
    sys.exit(1 if (n_fail or n_fragile or lint_bad) else 0)


if __name__ == "__main__":
    main()
