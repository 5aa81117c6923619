"""Staging lane for catalog registrations that are built in a round
whose driver window has no slots (the pattern VERDICT r12 called "the
proven staging lane"): full (factory, DuckDB-oracle) pairs live here
under the registered catalog's exact conventions — same
``(spark, sf_dir)`` signature, same exactness disciplines — and are
parity-gated by tests/test_pending_rows.py at sf0.001 (CI) and sf0.01
(round-close rehearsal, via SPARK_GRAFT_PENDING_SF) until a window
slot opens.  Promotion is a MOVE into ``queries.py`` ``@register`` +
``_DRIVER_PRIORITY`` (the pending test forbids double registration).

EMPTY as of r14: the three rows staged through r13
(sequence_count_events, sequence_count_stream_events,
top_event_paths_events) were promoted when the r14 rotation opened
slots — see queries.py's round-14 section and git history for the
staged originals.  (The r12-staged five were promoted at r13.)
"""

from __future__ import annotations

__all__ = ["PENDING_QUERIES", "pending_oracle_sql"]

PENDING_QUERIES: dict = {}
_PENDING_ORACLE_FACTORIES: dict = {}


def _pending(name: str, oracle=None):
    def deco(fn):
        PENDING_QUERIES[name] = fn
        if oracle is not None:
            _PENDING_ORACLE_FACTORIES[name] = (
                oracle if callable(oracle) else (lambda sf: oracle)
            )
        return fn

    return deco


def pending_oracle_sql(sf_dir: str) -> dict:
    """Rendered oracle SQL per pending row (factory convention mirrors
    queries.ORACLE_FACTORIES — some oracles bake sf-dependent
    constants)."""
    return {
        n: " ".join(f(sf_dir).split())
        for n, f in _PENDING_ORACLE_FACTORIES.items()
    }
