"""Streaming as-of join: each left event matched to the latest right
event at or before it, per key, in real time.

The batch operator (operators/asof.py) is a union-marker + window —
not streamable (an unbounded running window).  This is the stateful
formulation on ``applyInPandasWithState``: both sides union into ONE
keyed stream, per-key state buffers events still inside the watermark,
and a left event emits exactly when the watermark passes its timestamp
— at that point every right event at-or-before it has necessarily
arrived (any later-arriving right would be beyond the watermark), so
the match is final and exact, ties (equal timestamps) matching the
right row like DuckDB ASOF JOIN and the batch operator.

State per key is bounded: events inside the watermark horizon plus ONE
retained right event (the latest already-emittable one — it may still
be the match for future lefts).  That is the same O(keys + in-flight)
envelope as Spark's own stream-stream joins.

v1 payload contract: one BIGINT id per left event, one DOUBLE value per
right event (pack/cast around it); output is
``(key, left_id, left_ts, matched_ts, matched_value)`` with NULL match
columns when nothing precedes.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["streaming_as_of_join", "ASOF_OUTPUT_SCHEMA"]

ASOF_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("left_id", LongType()),
        StructField("left_ts", TimestampType()),
        StructField("matched_ts", TimestampType()),
        StructField("matched_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("lts", ArrayType(LongType())),   # buffered left ts (us)
        StructField("lid", ArrayType(LongType())),   # buffered left ids
        StructField("rts", ArrayType(LongType())),   # buffered right ts (us)
        StructField("rval", ArrayType(DoubleType())),
    ]
)


def _emit_and_prune(key, lts, lid, rts, rval, wm_us):
    """Emit lefts with ts <= watermark (their match set is complete),
    keep the rest; prune rights to those still inside the watermark
    plus the single latest one at-or-before it."""
    out = {k: [] for k in ("key", "left_id", "left_ts", "matched_ts", "matched_value")}
    rights = sorted(zip(rts, rval))
    keep_l_ts, keep_l_id = [], []
    for t, i in sorted(zip(lts, lid)):
        if t > wm_us:
            keep_l_ts.append(t)
            keep_l_id.append(i)
            continue
        m_ts = m_val = None
        for rt, rv in rights:  # rights sorted asc; last with rt <= t wins
            if rt <= t:
                m_ts, m_val = rt, rv
            else:
                break
        out["key"].append(key)
        out["left_id"].append(i)
        out["left_ts"].append(pd.Timestamp(t, unit="us"))
        out["matched_ts"].append(
            pd.Timestamp(m_ts, unit="us") if m_ts is not None else pd.NaT
        )
        out["matched_value"].append(m_val)
    keep_r = [(rt, rv) for rt, rv in rights if rt > wm_us]
    done_r = [(rt, rv) for rt, rv in rights if rt <= wm_us]
    if done_r:  # latest emittable right still serves future lefts
        keep_r.insert(0, done_r[-1])
    return out, keep_l_ts, keep_l_id, keep_r


def streaming_as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_val: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """``left`` and ``right`` are STREAMING DataFrames; returns the
    append-mode matched stream (ASOF_OUTPUT_SCHEMA)."""
    lhs = left.select(
        F.col(on).cast("long").alias("key"),
        F.col(left_ts).cast("timestamp").alias("ts"),
        F.lit(1).alias("is_left"),
        F.col(left_id).cast("long").alias("lid"),
        F.lit(None).cast("double").alias("rval"),
    )
    rhs = right.select(
        F.col(on).cast("long").alias("key"),
        F.col(right_ts).cast("timestamp").alias("ts"),
        F.lit(0).alias("is_left"),
        F.lit(None).cast("long").alias("lid"),
        F.col(right_val).cast("double").alias("rval"),
    )
    merged = lhs.unionByName(rhs).withWatermark("ts", watermark)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            lts, lid, rts, rval = state.get
            lts, lid = list(lts), list(lid)
            rts, rval = list(rts), list(rval)
        else:
            lts, lid, rts, rval = [], [], [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
                for t, is_l, i, v in zip(
                    ts_us, pdf["is_left"], pdf["lid"], pdf["rval"]
                ):
                    if is_l:
                        lts.append(int(t))
                        lid.append(int(i))
                    else:
                        rts.append(int(t))
                        rval.append(float(v))
        wm_us = state.getCurrentWatermarkMs() * 1000
        out, lts, lid, rights = _emit_and_prune(k, lts, lid, rts, rval, wm_us)
        rts = [rt for rt, _ in rights]
        rval = [rv for _, rv in rights]
        if lts or rts:
            state.update((lts, lid, rts, rval))
            if lts:
                # flush pending lefts as soon as the watermark passes them
                state.setTimeoutTimestamp(min(lts) // 1000 + 1)
        else:
            state.remove()
        if out["key"]:
            yield pd.DataFrame(out)

    return merged.groupBy(F.col("key")).applyInPandasWithState(
        fn,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
