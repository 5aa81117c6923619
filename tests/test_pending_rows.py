"""Parity gate for staged registrations (queries_pending.py): exactly
the oracle-replay discipline the registered catalog rides
(tests/test_oracle_parity.py), applied to every row waiting in the
staging lane — so rows arrive at registration already green, and the
only promotion work is the window slot.  When the lane is empty (as
after the r13 promotion of the five r12-staged rows), the
parametrized tests auto-skip and only the no-double-registration
invariant runs.

SF defaults to sf0.001 (CI); the round-close rehearsal re-runs this
file with SPARK_GRAFT_PENDING_SF=/root/testdata/sf0.01 — the driver's
gate SF."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get(
    "SPARK_GRAFT_PENDING_SF", "/root/testdata/sf0.001"
)

from duckdb_imputation_spark.queries_pending import (  # noqa: E402
    PENDING_QUERIES,
    pending_oracle_sql,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


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


def test_every_pending_row_has_an_oracle():
    oracles = pending_oracle_sql(SF_DIR)
    assert set(oracles) == set(PENDING_QUERIES)
    # the staged names must NOT already be registered (promotion is a
    # move, not a copy — double registration would corrupt the window)
    from duckdb_imputation_spark.queries import QUERIES

    assert not set(PENDING_QUERIES) & set(QUERIES)


@pytest.mark.parametrize("name", sorted(PENDING_QUERIES))
def test_pending_row_plan_lint(spark, name):
    """Staged rows carry the registered catalog's plan discipline from
    day one: zero error-level lint findings (single-task funnels,
    cartesian products, row-Python UDFs) — warn/info classes (benign
    scalar-stat attaches, non-pushable computed filters) are allowed,
    exactly as tests/test_plan_lint.py allows them for the catalog."""
    from duckdb_imputation_spark.plans import lint_plan

    findings = lint_plan(PENDING_QUERIES[name](spark, SF_DIR))
    errors = [f for f in findings if f.severity == "error"]
    assert not errors, errors


@pytest.mark.parametrize("name", sorted(PENDING_QUERIES))
def test_pending_row_matches_oracle(spark, ddb, name):
    got = PENDING_QUERIES[name](spark, SF_DIR).toPandas()
    exp = ddb.execute(pending_oracle_sql(SF_DIR)[name]).df()
    assert len(got) == len(exp), f"row count {len(got)} != oracle {len(exp)}"
    g, e = canon(got), canon(exp)
    assert list(g.columns) == list(e.columns), (g.columns, e.columns)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            assert np.array_equal(
                g[c].to_numpy(), e[c].to_numpy(), equal_nan=True
            ), f"column {c} differs"
        else:
            assert g[c].equals(e[c]), f"column {c} differs"
