#!/usr/bin/env python
"""Replay the driver's correctness gate for the DECLARED WINDOW (first
50 of ordered_queries()) — the exact subset the driver hash-gates —
against the DuckDB oracle at a given SF.  Mirrors
tests/test_oracle_parity.py's comparison (row counts + column-sorted,
row-sorted exact values).

Usage: python tools/replay_window.py [sf_dir] [n|name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR

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
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x) if x is not None else None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> None:
    rest = sys.argv[2:]
    all_q = entry_mod.queries()
    names = list(all_q)[:50]
    if rest:
        if len(rest) == 1 and rest[0].isdigit():
            names = names[: int(rest[0])]
        else:
            names = rest
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark("replay_window")
    n_pass = n_skip = 0
    fails = []
    for name in names:
        try:
            got = all_q[name](spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"SKIP  {name} (rows-only: {len(got)} rows)", flush=True)
                n_skip += 1
                continue
            exp = con.execute(oracles[name]).df()
            assert len(got) == len(exp), f"rows {len(got)} != {len(exp)}"
            g, e = canon(got), canon(exp)
            assert list(g.columns) == list(e.columns), (
                list(g.columns), list(e.columns))
            for c in g.columns:
                if pd.api.types.is_float_dtype(g[c]):
                    assert np.array_equal(
                        g[c].to_numpy(), e[c].to_numpy(), equal_nan=True
                    ), f"col {c} differs"
                else:
                    assert g[c].equals(e[c]), f"col {c} differs"
            print(f"PASS  {name} ({len(got)} rows)", flush=True)
            n_pass += 1
        except Exception as ex:
            print(f"FAIL  {name}: {ex!r:.300}", flush=True)
            fails.append(name)
    print(f"\n{n_pass} pass, {n_skip} rows-only, {len(fails)} fail: {fails}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
