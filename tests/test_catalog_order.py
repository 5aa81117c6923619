"""Driver-window ordering guards.

The driver's correctness harness hashes only the FIRST 50 entries of
``queries()``; these tests pin the invariants that round 2's VERDICT
found violated (10 oracles past the cutoff, never driver-verified).
"""

import json
import os

import pytest

import __spark_entry__ as entry_mod
from duckdb_imputation_spark.queries import (
    _DRIVER_DEMOTE,
    _DRIVER_PRIORITY,
    QUERIES,
)

DRIVER_WINDOW = 50
# repo root derived from this file's location, not hardcoded — the test
# must find the CORRECTNESS_r*.json files in any checkout
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_and_demote_names_exist():
    # every pinned name must be a real registration; ordered_queries()
    # skipping unknown names is a runtime safety net, not a license for
    # stale pins
    unknown = [
        n for n in _DRIVER_PRIORITY + _DRIVER_DEMOTE if n not in QUERIES
    ]
    assert not unknown, f"pinned but never registered: {unknown}"


def test_no_overlap_between_priority_and_demote():
    assert not set(_DRIVER_PRIORITY) & set(_DRIVER_DEMOTE)


def test_ordering_preserves_catalog():
    ordered = entry_mod.queries()
    assert set(ordered) == set(QUERIES)
    assert len(ordered) == len(QUERIES)


def test_never_driver_verified_queries_inside_window():
    """Every catalog query that has never had a PASSING driver hash row
    (hash_match true, no error — mere presence in a correctness file is
    not verification) must sit inside the first-50 window."""
    verified: set[str] = set()
    found_any = False
    for fname in sorted(os.listdir(ROOT)):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            found_any = True
            with open(os.path.join(ROOT, fname)) as f:
                data = json.load(f)
            verified |= {
                n
                for n, v in data.items()
                if v.get("hash_match") and not v.get("err")
            }
    if not found_any:
        pytest.skip("no driver correctness files in this checkout")
    window = list(entry_mod.queries())[:DRIVER_WINDOW]
    outside = [
        n for n in entry_mod.queries() if n not in verified and n not in window
    ]
    assert not outside, f"never-verified queries past the cutoff: {outside}"


def test_demoted_queries_keep_oracles():
    """Rotating a query past the window must not drop its local-gate
    oracle — demoted rows stay hash-checked by test_oracle_parity."""
    oracles = entry_mod.oracle_sql()
    missing = [n for n in _DRIVER_DEMOTE if n in QUERIES and n not in oracles]
    assert not missing, missing


def test_window_not_overfull():
    front = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    assert len(front) <= DRIVER_WINDOW
