"""Streaming half-life EWMA — the live form of
:func:`..operators.timeseries.ewma_halflife` on
``applyInPandasWithState``, and the UNBOUNDED-SERIES answer for the
keyed fold (VERDICT r7 #7: the batch operator's per-key collect_list
must fit one task; this twin's state is two doubles per key, O(keys)
total, never O(events)).

Per-key state is (s, pt): the smoothed value and the timestamp of the
last REAL observation.  Rows fold in timestamp order WITHIN each
micro-batch and in arrival order ACROSS batches — with an in-order
source (time-partitioned files, availableNow replay) the output equals
the batch operator row for row, including state recovered across runs
through the checkpoint (same contract as
:mod:`.cusum_stream`, asserted in tests/test_streaming.py).

NULL values carry BOTH the state and the time anchor through unchanged
and emit NULL (the gap keeps accumulating, so the next real value
decays by the FULL elapsed time — the batch operator's rule exactly).
A NULL TIMESTAMP (out of contract for the batch operator, whose
``ts_col`` must be non-NULL numeric) is handled the same defensive
way here: the row emits NULL and neither s nor the anchor moves —
never letting a NaN into the state, where it would both poison every
later value and collide with the "no observation yet" NaN sentinel.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, StructField, StructType

__all__ = ["ewma_halflife_stream"]

_STATE_SCHEMA = StructType(
    [StructField("s", DoubleType()), StructField("pt", DoubleType())]
)

_LN2 = math.log(2.0)


def ewma_halflife_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    halflife: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key streaming gap-aware EWMA: emits every processed row as
    (key_col, ts_col, value_col, out_col) with

        s_1 = x_1
        w_t = exp(-ln(2) * (t_t - t_{t-1}) / halflife)
        s_t = w_t * s_{t-1} + (1 - w_t) * x_t

    ``ts_col`` must be numeric (epoch seconds/millis/micros —
    ``halflife`` in the same unit) and unique per key."""
    key_f = stream.schema[key_col]
    ts_f = stream.schema[ts_col]
    out_schema = StructType(
        [
            StructField(key_col, key_f.dataType),
            StructField(ts_col, ts_f.dataType),
            StructField(value_col, DoubleType()),
            StructField(out_col, DoubleType()),
        ]
    )
    hl = float(halflife)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        # state stores NaN for "no observation yet" (the state schema
        # is non-nullable-friendly doubles; NaN round-trips where a
        # Python None would not)
        if state.exists:
            s, pt = state.get
            s = None if s is None or math.isnan(s) else float(s)
            pt = None if pt is None or math.isnan(pt) else float(pt)
        else:
            s, pt = None, None
        out_x, out_s = [], []
        for t, x in zip(rows[ts_col], rows[value_col]):
            # a NULL timestamp is unusable for gap decay: emit NULL and
            # leave BOTH s and pt untouched (same carry rule as NULL x)
            # — without this guard a NaN t would poison s forever AND
            # collide with the NaN state sentinel (review r8)
            if pd.isna(x) or pd.isna(t):
                out_x.append(None if pd.isna(x) else float(x))
                out_s.append(None)
                continue
            x = float(x)
            t = float(t)
            if s is None:
                s = x
            else:
                w = math.exp(-_LN2 * (t - pt) / hl)
                s = w * s + (1.0 - w) * x
            pt = t
            out_x.append(x)
            out_s.append(s)
        state.update(
            (
                float("nan") if s is None else s,
                float("nan") if pt is None else pt,
            )
        )
        yield pd.DataFrame(
            {
                key_col: [k] * len(rows),
                ts_col: rows[ts_col].to_list(),
                value_col: out_x,
                out_col: out_s,
            }
        )

    return stream.groupBy(F.col(key_col)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
