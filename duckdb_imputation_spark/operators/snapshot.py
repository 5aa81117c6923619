"""Corpus snapshot diff — dataset versioning for incremental pipelines.

A training corpus is rebuilt in snapshots; downstream stages (dedup
index refresh, re-tokenization, eval decontamination) only want the
DELTA.  ``snapshot_diff`` classifies every key as ``added`` / ``removed``
/ ``changed`` (content digest differs) between two snapshot frames:

  per side: md5 digest over the compared columns (one narrow projection,
  no shuffle) → full outer equi-join on the key (one hash shuffle per
  side, the unavoidable minimum for arbitrary inputs) → classify.

Unchanged rows are dropped by default — the output is delta-sized, so
everything downstream of the join is |delta|, not |corpus|.

At 100 TB: store snapshots bucketed by the key (``bucketBy(N, key)``)
and the outer join becomes a co-located zipper with NO shuffle; the
digest projection pushes column pruning into the scan either way.
``snapshot_apply`` replays a diff onto the old snapshot to reproduce the
new one — the (diff, apply) pair is the round-trip contract.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "snapshot_apply"]

# field separator / null sentinel for the row digest — md5 over a
# joined rendering needs unambiguous boundaries so ("a", "b|c") never
# collides with ("a|b", "c"), and NULL never collides with "NULL"
_SEP = "\x1f"
_NULL = "\x00null\x00"


def _digest(cols: Sequence[str]) -> F.Column:
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.encode(F.concat_ws(_SEP, *rendered), "utf-8"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level delta between two snapshots keyed by ``key_cols``.

    Returns (key_cols..., change_type) with ``change_type`` in
    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (both sides, compared columns differ — NULL-safe via a
    null-sentinel digest).  ``compare_cols`` defaults to every column
    both frames share minus the keys.  ``include_unchanged=True`` keeps
    ``unchanged`` rows too (corpus-sized output — off by default)."""
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    compare_cols = list(compare_cols)
    o = old.select(*keys, _digest(compare_cols).alias("__old_digest"))
    n = new.select(*keys, _digest(compare_cols).alias("__new_digest"))
    joined = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("__old_digest").isNull(), F.lit("added"))
        .when(F.col("__new_digest").isNull(), F.lit("removed"))
        .when(
            F.col("__old_digest") != F.col("__new_digest"), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, change.alias("change_type"))
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def snapshot_apply(
    old: DataFrame,
    new: DataFrame,
    diff: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Replay ``diff`` (from :func:`snapshot_diff`) onto ``old``: drop
    removed/changed keys, append added/changed rows taken from ``new``.
    Round-trip contract: the result row-set equals ``new`` whenever
    ``diff`` was produced from the same (old, new) pair.  Both legs are
    slim key joins; the appended payload rows stream from ``new``."""
    keys = list(key_cols)
    gone = diff.filter(
        F.col("change_type").isin("removed", "changed")
    ).select(*keys)
    fresh = diff.filter(
        F.col("change_type").isin("added", "changed")
    ).select(*keys)
    kept = old.join(gone, on=keys, how="left_anti")
    return kept.unionByName(new.join(fresh, on=keys, how="left_semi"))
