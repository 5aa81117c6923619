"""Fuzzy (edit-distance) joins without all-pairs — SymSpell-style
deletion-variant blocking.

Record linkage and near-key matching ("Jon Smith" ⋈ "John Smith",
fat-fingered product codes, OCR'd identifiers) need a join on
``levenshtein(a, b) <= d``.  The naive plan is a cross join with a
distance filter — O(n·m) comparisons, unrunnable at corpus scale.  The
classic lossless alternative (Wolf Garbe's SymSpell construction) is
DELETION-VARIANT BLOCKING:

    dist(s1, s2) <= d  ⇒  del_<=d(s1) ∩ del_<=d(s2) ≠ ∅

where ``del_<=d(s)`` is the set of strings obtainable from ``s`` by at
most ``d`` character deletions.  (A substitution at position i is
covered by deleting position i from both sides; an insertion by
deleting the inserted char from one side; compositions nest up to d.)
So: explode each side into its deletion variants, equi-join on the
variant, and verify surviving candidate pairs with the exact
``levenshtein`` — no false negatives by the implication above, false
positives (the intersection also catches pairs up to distance 2d)
killed by the verify.  Everything is built-in Column functions
(transform/sequence/substr, then the JVM levenshtein) — no Python in
the path.

Scale shape: variants per string = O(len^d) (len+1 for d=1), so the
exploded frame is a small constant factor over the input; the
equi-join shuffles on the variant key.  Skew caveat: very short
strings produce very popular variants (the empty string is a variant
of every 1-char string) — the ``min_length`` guard drops them from
blocking (they are cheap to handle exactly if needed), and the
length-difference prefilter ``|len(a) - len(b)| <= d`` cuts candidate
pairs before the O(len²) distance kernel runs.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "deletion_variants",
    "fuzzy_join",
    "fuzzy_self_pairs",
    "variant_block_stats",
]

logger = logging.getLogger(__name__)


def variant_block_stats(
    df: DataFrame,
    col: str,
    max_distance: int = 1,
    min_length: int = 3,
    cap: int | None = None,
) -> dict:
    """Diagnostic job: the variant-block size distribution and — when
    ``cap`` is given — exactly what ``max_block=cap`` would drop
    (blocks, rows, and the largest block).  The fuzzy-join mirror of
    dedup's ``bucket_skew_stats``: the cap itself stays a silent
    lazy-plan guard, this opt-in one-aggregate job makes the recall
    trade VISIBLE before (or after) you pay it.  A warning is logged
    when the cap drops anything — the r8 rehearsal measured the trade
    at 10x duplication: the cap cut the wall 11.2x while keeping ~3.6%
    of (mostly duplication-multiplicity) pairs, which you want to KNOW,
    not discover."""
    blocked = _blocked(df, df.columns[0], col, max_distance, min_length)
    sizes = blocked.groupBy("__v").agg(F.count(F.lit(1)).alias("n"))
    aggs = [
        F.count(F.lit(1)).alias("blocks"),
        F.max("n").alias("max_block_size"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("blocked_rows"),
    ]
    if cap is not None:
        aggs += [
            F.count(F.when(F.col("n") > cap, 1)).alias("dropped_blocks"),
            F.coalesce(
                F.sum(F.when(F.col("n") > cap, F.col("n"))), F.lit(0)
            ).alias("dropped_rows"),
        ]
    stats = sizes.select(*aggs).first().asDict()
    if cap is not None and stats["dropped_blocks"]:
        logger.warning(
            "max_block=%d would drop %d hot variant block(s) covering "
            "%d of %d blocked rows (largest block %d) — recall is "
            "traded on those keys; exact-dedup first removes the need",
            cap, stats["dropped_blocks"], stats["dropped_rows"],
            stats["blocked_rows"], stats["max_block_size"],
        )
    return stats


def deletion_variants(col: Column, d: int = 1) -> Column:
    """Array of DISTINCT strings reachable from ``col`` by at most
    ``d`` character deletions (including the string itself).  d in
    {1, 2}.  Pure Column expression: transform over a position
    sequence + substr concatenation, JVM-side."""
    if d not in (1, 2):
        raise ValueError("deletion_variants supports d in {1, 2}")

    def del1(c: Column) -> Column:
        # delete position i (1-based) for every i
        return F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat(
                c.substr(F.lit(1), i - 1),
                c.substr(i + 1, F.length(c) - i),
            ),
        )

    v1 = F.array_union(F.array(col), del1(col))
    if d == 1:
        return F.array_distinct(v1)
    v2 = F.flatten(F.transform(del1(col), del1))
    return F.array_distinct(F.concat(v1, v2))


def _blocked(
    df: DataFrame, id_col: str, col: str, d: int, min_length: int
) -> DataFrame:
    s = F.col(col)
    kept = df.where(
        s.isNotNull() & (F.length(s) >= F.lit(min_length))
    ).select(F.col(id_col), s.alias("__s"))
    return kept.select(
        id_col,
        "__s",
        F.explode(deletion_variants(F.col("__s"), d)).alias("__v"),
    )


def _cap_blocks(blocked: DataFrame, max_block: int | None) -> DataFrame:
    """Drop variant blocks larger than ``max_block`` rows — the same
    hot-bucket guard the MinHash/SimHash/n-gram dedup family applies
    (bucket_cap / df_cap).  A block only exceeds the cap when MANY
    near-identical strings share a variant (mass exact duplication);
    capping trades recall on those pathological keys for a hard bound
    on the join's per-key fan-out.  The r7b rehearsal measured why:
    10x-duplicated customer names grow the PAIR OUTPUT ~100x
    (quadratic in duplication multiplicity) — when that output is not
    what you want, run exact dedup first or set the cap."""
    if max_block is None:
        return blocked
    sizes = blocked.groupBy("__v").agg(F.count(F.lit(1)).alias("__bn"))
    small = sizes.where(F.col("__bn") <= max_block).select("__v")
    return blocked.join(small, "__v", "left_semi")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    max_distance: int = 1,
    min_length: int = 3,
    max_block: int | None = None,
) -> DataFrame:
    """All (left_id, right_id, distance) pairs with
    ``levenshtein(left_on, right_on) <= max_distance``, computed via
    deletion-variant blocking — NEVER a cross join.  Strings shorter
    than ``min_length`` are excluded from matching entirely (their
    variant blocks are pathologically hot; handle them with an exact
    or broadcast path if they matter).  ``max_block`` (optional) drops
    variant blocks larger than the cap — see :func:`_cap_blocks` for
    the recall trade-off; None (default) is exact."""
    lb = _cap_blocks(
        _blocked(left, left_id, left_on, max_distance, min_length),
        max_block,
    )
    rb = _cap_blocks(
        _blocked(right, right_id, right_on, max_distance, min_length),
        max_block,
    ).withColumnRenamed("__s", "__t")
    cand = (
        lb.join(rb, "__v")
        .where(
            (F.length("__s") - F.length("__t")).between(
                -max_distance, max_distance
            )
        )
        .select(left_id, right_id, "__s", "__t")
        .distinct()
    )
    return cand.where(
        F.levenshtein("__s", "__t") <= F.lit(max_distance)
    ).select(
        left_id,
        right_id,
        F.levenshtein("__s", "__t").alias("distance"),
    )


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    col: str,
    max_distance: int = 1,
    min_length: int = 3,
    max_block: int | None = None,
) -> DataFrame:
    """Unordered near-duplicate pairs within one table:
    (id_a, id_b, distance) with id_a < id_b and
    ``levenshtein <= max_distance`` — the fuzzy-dedup face of
    :func:`fuzzy_join` (blocked self-join, identity pairs and both
    orientations collapsed)."""
    b = _cap_blocks(
        _blocked(df, id_col, col, max_distance, min_length), max_block
    )
    a = b.select(
        F.col(id_col).alias("id_a"), F.col("__s").alias("__sa"), "__v"
    )
    c = b.select(
        F.col(id_col).alias("id_b"), F.col("__s").alias("__sb"), "__v"
    )
    cand = (
        a.join(c, "__v")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            (F.length("__sa") - F.length("__sb")).between(
                -max_distance, max_distance
            )
        )
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
    )
    return cand.where(
        F.levenshtein("__sa", "__sb") <= F.lit(max_distance)
    ).select(
        "id_a",
        "id_b",
        F.levenshtein("__sa", "__sb").alias("distance"),
    )
