"""Streaming Misra–Gries heavy-hitter summaries — the live form of
:func:`..operators.sketches.misra_gries_candidates` on
``applyInPandasWithState``.

The monitoring deployment of frequent-item tracking: a token / URL /
key stream is folded into a bounded summary as it arrives, and after
every micro-batch the current summary is emitted — the operations
question ("what is hot RIGHT NOW, and how hot at least?") answered
during ingestion instead of at the next batch audit.

Summary maintenance uses the MERGEABLE form (Agarwal, Cormode,
Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012): each
micro-batch's EXACT value counts (vectorized pandas ``value_counts``,
no per-row Python loop) merge into the k retained counters, then the
summary prunes back to k by subtracting the (k+1)-th largest count
from every counter and dropping the non-positive — the same guarantee
chain as sequential Misra–Gries: after N processed rows, every value
with true frequency > N/(k+1) is IN the summary, and each retained
estimate m̂ satisfies ``f − N/(k+1) ≤ m̂ ≤ f``.

State per key is AT MOST k (value, count) pairs plus one total —
bounded regardless of the distinct-value count, never O(stream);
within a micro-batch the transient count dict is batch-vocabulary-
sized (the same bound as any per-batch aggregation).  With
``key_col=None`` the whole stream folds under ONE constant key — a
sequential global summary (one task per batch; the honest cost of a
total order over a merge tree) — while a real ``key_col`` gives
per-key summaries that parallelize across the key space.

The summary emitted after the FINAL batch (max ``n_processed``) is a
candidate SUPERSET of the true heavy hitters; exactness comes from
the batch two-pass discipline — semi-join the corpus against the
candidates and keep ``cnt·(k+1) > N`` — which the catalog row drives
end to end against the same GROUP BY ... HAVING oracle as the batch
operator.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["heavy_hitters_stream"]

_STATE_SCHEMA = StructType(
    [
        StructField("values", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def heavy_hitters_stream(
    stream: DataFrame,
    value_col: str,
    k: int,
    key_col: str | None = None,
) -> DataFrame:
    """Per-key streaming Misra–Gries summary: after every micro-batch
    emits the key's current summary as
    (key, value, m_hat, n_processed) rows — ``m_hat`` the retained
    lower-bound estimate, ``n_processed`` the key's total row count so
    far (monotone: the final summary is the max-``n_processed``
    snapshot per key)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    key_expr = (
        F.col(key_col) if key_col is not None else F.lit("__all")
    ).cast("string")
    src = stream.select(
        key_expr.alias("key"),
        F.col(value_col).cast("string").alias("v"),
    ).where(F.col("v").isNotNull())

    def fold(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            values, counts, n = state.get
            counters = dict(zip(values, (int(c) for c in counts)))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            vc = pdf["v"].value_counts()
            n += int(vc.sum())
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # mergeable-summaries prune: subtract the (k+1)-th
                # largest count from all, drop the non-positive
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        state.update((list(counters.keys()), list(counters.values()), n))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(counters),
                "value": list(counters.keys()),
                "m_hat": list(counters.values()),
                "n_processed": [n] * len(counters),
            }
        )

    return src.groupBy("key").applyInPandasWithState(
        fold,
        "key string, value string, m_hat long, n_processed long",
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
