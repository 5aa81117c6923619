"""Custom stateful streaming operator: gap-based sessionization.

Demonstrates the ``applyInPandasWithState`` surface for operators that
windowed aggregation can't express: events are grouped per user and
stitched into sessions that close after ``gap`` seconds of inactivity.
State per key is one open session (constant size); timed-out state is
flushed via ``GroupStateTimeout.EventTimeTimeout`` driven by the
watermark — at scale, state volume is O(active users), never O(events).

Also usable in batch mode (:func:`sessionize_batch`) where the same
session semantics compile to a window + cumulative-sum plan — handy as
the oracle for the streaming path.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["sessionize_stream", "sessionize_batch", "SESSION_SCHEMA"]

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", IntegerType()),
        StructField("sum_value", DoubleType()),
    ]
)


def sessionize_stream(
    stream: DataFrame,
    gap_seconds: int = 600,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """events stream → closed sessions (emitted once their gap expires)."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            if state.exists:
                s, e, n, v = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user],
                        "session_start": [pd.Timestamp(s, unit="us")],
                        "session_end": [pd.Timestamp(e, unit="us")],
                        "n_events": [n],
                        "sum_value": [v],
                    }
                )
            return

        events = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_us = events[ts_col].astype("int64") // 1000  # ns → us
        vals = events[value_col].astype(float)
        if state.exists:
            s, e, n, v = state.get
        else:
            s = e = None
            n, v = 0, 0.0
        out = {k: [] for k in ("user_id", "session_start", "session_end", "n_events", "sum_value")}
        for t_us, val in zip(ts_us, vals):
            t_us = int(t_us)
            if s is None:
                s, e, n, v = t_us, t_us, 1, float(val)
            elif t_us - e <= gap_us:
                e, n, v = max(e, t_us), n + 1, v + float(val)
            else:  # close previous session, open a new one
                out["user_id"].append(user)
                out["session_start"].append(pd.Timestamp(s, unit="us"))
                out["session_end"].append(pd.Timestamp(e, unit="us"))
                out["n_events"].append(n)
                out["sum_value"].append(v)
                s, e, n, v = t_us, t_us, 1, float(val)
        state.update((s, e, n, v))
        state.setTimeoutTimestamp(e // 1000 + gap_seconds * 1000)  # ms
        if out["user_id"]:
            yield pd.DataFrame(out)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    df: DataFrame,
    gap_seconds: int = 600,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Same session semantics in batch: a new session starts whenever the
    gap to the previous event exceeds ``gap_seconds`` (window lag +
    cumulative sum — the plan is one shuffle on user)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    new_session = (
        F.col(ts_col).cast("double")
        - F.lag(F.col(ts_col).cast("double"), 1, 0.0).over(w)
        > float(gap_seconds)
    ).cast("int")
    with_id = df.withColumn("__new", new_session).withColumn(
        "__session", F.sum("__new").over(w)
    )
    return with_id.groupBy(user_col, "__session").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.sum(F.col(value_col).cast("double")).alias("sum_value"),
    ).drop("__session")
