"""Staging lane for catalog registrations that are built in a round
whose driver window has no slots (the pattern VERDICT r12 called "the
proven staging lane"): full (factory, DuckDB-oracle) pairs live here
under the registered catalog's exact conventions — same
``(spark, sf_dir)`` signature, same exactness disciplines — and are
parity-gated by tests/test_pending_rows.py at sf0.001 (CI) and sf0.01
(round-close rehearsal, via SPARK_GRAFT_PENDING_SF) until a window
slot opens.  Promotion is a MOVE into ``queries.py`` ``@register`` +
``_DRIVER_PRIORITY`` (the pending test forbids double registration).

EMPTY as of r13: the five rows staged through r12
(window_funnel_stream_events, per_class_calibration_events,
streaming_calibration_events, window_funnel_strict_order_events,
ann_recall_batch) were promoted when the r13 window opened — see
queries.py's round-13 section and git history for the staged
originals.
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
