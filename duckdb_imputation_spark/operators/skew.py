"""Skew mitigation helpers.

AQE's skew-join split (enabled in session.py) handles most sort-merge
skew at runtime; explicit salting remains the tool for the cases AQE
can't rewrite — a broadcast-ineligible right side with a handful of
pathological keys, or a deliberately pre-partitioned pipeline where a
runtime re-plan is unwanted.  ``salted_join`` spreads each skewed key
over ``n_salts`` shuffle partitions by salting the big side and
replicating the small side per salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join a skew-prone ``big`` side against ``small`` with key salting:
    big rows get a uniform salt in [0, n_salts); small is replicated once
    per salt value, so each (key, salt) shuffle partition carries ~1/n of
    the hot key's rows.  Costs n_salts× the small side's shuffle volume —
    use when the hot keys would otherwise serialize on single tasks and
    broadcast is off the table.

    Semantics match ``big.join(small, on, how)`` for inner/left joins
    (every big row keeps exactly its one salt; every small row exists for
    every salt).

    The salt is ``pmod(hash(<all big columns>, seed), n_salts)`` — a pure
    function of row content, so retries / speculative tasks / AQE
    replans recompute the SAME salt (``rand(seed)`` is seeded per
    partition and shifts when partitioning changes).  Hashing the whole
    row, not just the join keys: a hot key's rows must land on
    DIFFERENT salts to spread, and they differ in their payload columns.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in big.columns], F.lit(seed)), F.lit(n_salts)),
    )
    # replicate the small side per salt with a narrow explode of a
    # literal array — no join node (the crossJoin(broadcast(range))
    # formulation plans as a BroadcastNestedLoopJoin, which the plan
    # lint rightly treats as a red flag; a generate is cheaper anyway)
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )
    out = salted_big.join(salted_small, [*on, "__salt"], how)
    return out.drop("__salt")
