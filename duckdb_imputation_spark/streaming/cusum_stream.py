"""Streaming CUSUM drift alarms — the live form of
:func:`..operators.timeseries.cusum` on ``applyInPandasWithState``.

The monitoring deployment of Page's statistic: a per-key quality /
volume metric stream (per-source document quality scores, per-pipeline
ingest rates) is folded through the two-sided CUSUM recurrence as it
arrives, and every processed row is emitted with its running statistic
and alarm flag — drift fires an alarm DURING ingestion instead of at
the next batch audit.

State per key is two doubles (hi, lo) — constant size, O(keys) total,
never O(events); no timeout, the detector simply lives as long as its
key.  Ordering: rows are folded in event order WITHIN each micro-batch
(sorted on the order column) and in arrival order ACROSS batches —
with an in-order source (time-partitioned files, availableNow replay)
the output equals the batch operator row for row (asserted in
tests/test_streaming.py, including state carried across separate
runs through the checkpoint); late cross-batch arrivals fold late,
which is the honest semantics of an order-sensitive sequential test.

NULL values carry state through unchanged and emit NULL statistics —
a gap is not evidence (same rule as the batch operator).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

__all__ = ["cusum_stream"]

_STATE_SCHEMA = StructType(
    [StructField("hi", DoubleType()), StructField("lo", DoubleType())]
)


def cusum_stream(
    stream: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """Per-key streaming CUSUM: emits every processed row as
    (key_col, order_col, value_col, cusum_hi, cusum_lo, alarm) with
    ``alarm`` ∈ {0, +1, −1}; the alarming side resets (restart
    detection), exactly the batch operator's recurrence."""
    key_f = stream.schema[key_col]
    order_f = stream.schema[order_col]
    out_schema = StructType(
        [
            StructField(key_col, key_f.dataType),
            StructField(order_col, order_f.dataType),
            StructField(value_col, DoubleType()),
            StructField("cusum_hi", DoubleType()),
            StructField("cusum_lo", DoubleType()),
            StructField("alarm", IntegerType()),
        ]
    )
    t_, s_, h_ = float(target), float(slack), float(threshold)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        rows = pd.concat(list(pdfs)).sort_values(order_col)
        hi, lo = state.get if state.exists else (0.0, 0.0)
        out_hi, out_lo, out_al, out_x = [], [], [], []
        for x in rows[value_col]:
            if pd.isna(x):
                out_x.append(None)
                out_hi.append(None)
                out_lo.append(None)
                out_al.append(0)
                continue
            x = float(x)
            hi_raw = max(0.0, hi + (x - t_ - s_))
            lo_raw = max(0.0, lo - (x - t_ + s_))
            alarm = 1 if hi_raw > h_ else (-1 if lo_raw > h_ else 0)
            hi = 0.0 if alarm == 1 else hi_raw
            lo = 0.0 if alarm == -1 else lo_raw
            out_x.append(x)
            out_hi.append(hi_raw)
            out_lo.append(lo_raw)
            out_al.append(alarm)
        state.update((hi, lo))
        yield pd.DataFrame(
            {
                key_col: [k] * len(rows),
                order_col: rows[order_col].to_list(),
                value_col: out_x,
                "cusum_hi": out_hi,
                "cusum_lo": out_lo,
                "alarm": out_al,
            }
        )

    return stream.groupBy(F.col(key_col)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
