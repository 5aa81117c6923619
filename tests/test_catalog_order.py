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


def test_evidence_age_within_window():
    """The evidence-age rule, made mechanical (VERDICT r9 #1): at round
    N close, no registered row's newest green driver evidence may be
    older than round N−4.  The round in progress is N = (newest
    CORRECTNESS file) + 1, so every row whose newest green evidence is
    at round N−5 or older — the cohort that would breach the rule at
    THIS round's close — must be scheduled inside the 50-row driver
    window now (or carry an explicit, documented exception in
    ``_EVIDENCE_AGE_EXCEPTIONS``).  This converts the twice-negotiated
    hygiene rule (VERDICT r7 #5, r8 #1, r9 finding #1) into a gate that
    cannot slip: letting a cohort age out without window slots fails CI
    the moment the round starts, not at judging."""
    from duckdb_imputation_spark.queries import _EVIDENCE_AGE_EXCEPTIONS

    newest: dict[str, int] = {}
    max_round = 0
    for fname in sorted(os.listdir(ROOT)):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            rnd = int(fname[len("CORRECTNESS_r"):-len(".json")])
            max_round = max(max_round, rnd)
            with open(os.path.join(ROOT, fname)) as f:
                data = json.load(f)
            for n, v in data.items():
                if v.get("hash_match") and not v.get("err"):
                    newest[n] = max(newest.get(n, 0), rnd)
    if not max_round:
        pytest.skip("no driver correctness files in this checkout")
    current_round = max_round + 1
    window = set(list(entry_mod.queries())[:DRIVER_WINDOW])
    stale = sorted(
        n
        for n, r in newest.items()
        if n in QUERIES
        and r <= current_round - 5
        and n not in window
        and n not in _EVIDENCE_AGE_EXCEPTIONS
    )
    assert not stale, (
        f"rows whose newest driver evidence (<= r{current_round - 5}) ages "
        f"past the N-4 line at round {current_round} close, yet are not "
        f"scheduled in the driver window: {stale}"
    )
