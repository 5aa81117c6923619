"""Live ordered conversion funnel — the streaming twin of
operators/funnel.py (strict-order earliest-completion semantics),
emitting one append-mode row the moment a user REACHES each stage.

Exact batch equivalence by construction: events are buffered per user
until the watermark guarantees nothing earlier can arrive, then folded
through the stage machine in event-time order — and the greedy
earliest-completion machine is PREFIX-STABLE (its state after a sealed
prefix equals the batch machine's state over that prefix), so every
emitted (user, stage, reached_at) row equals the batch
``funnel_users`` cell over the sealed events.  Out-of-order arrival
within the watermark is invisible; data later than the watermark is
dropped by the engine (the standard lateness contract every twin here
shares).

State per user, bounded:
* the machine — stage index + two timestamps (three scalars);
* the unsealed buffer — stage-type events newer than the watermark
  (rate × watermark-delay bounded, the asof-join twin's bound).
Sealed events are folded and DISCARDED immediately — state never
holds history.  Users at stage 0 with an empty buffer are removed
(a fresh machine is identical); users with progress keep their three
scalars so a late replay can never re-emit a stage (exactly-once per
(user, stage) by construction).  Flushes ride
``EventTimeTimeout`` armed at the oldest buffered event, the
asof-stream discipline.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "funnel_stream",
    "FUNNEL_OUTPUT_SCHEMA",
    "sequence_count_stream",
    "SEQUENCE_COUNT_OUTPUT_SCHEMA",
    "window_funnel_stream",
    "WINDOW_FUNNEL_OUTPUT_SCHEMA",
]

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage_idx", IntegerType()),
        StructField("stage", StringType()),
        StructField("reached_at", TimestampType()),
    ]
)

# k = stages reached so far; t1/tlast in µs (-1 = unset); unsealed
# buffer as parallel (ts, stage-index) arrays
_STATE_SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("t1_us", LongType()),
        StructField("tlast_us", LongType()),
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_k", ArrayType(IntegerType())),
    ]
)


def funnel_stream(
    stream: DataFrame,
    stages: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    watermark: str = "10 minutes",
    within: float | None = None,
) -> DataFrame:
    """events stream → append-mode stage-reached rows
    (FUNNEL_OUTPUT_SCHEMA).  ``within`` (seconds) bounds every later
    stage to that long after the user's stage-1 anchor, matching the
    batch operator's knob.

    Clock caveat: only STAGE-TYPE events advance the watermark —
    Catalyst pushes the deterministic stage filter below the
    EventTimeWatermark node (measured: a filtered-out event contributes
    no event-time stats), so non-funnel traffic cannot flush buffers.
    Same contract as the sessionize/as-of twins, which also watermark
    their own filtered stream.

    Retention (same consequence ADVICE r11 #1 named on the window
    twin): once a user has reached any stage, the three scalars
    (k, t1, tlast) persist FOREVER — they are what makes emission
    exactly-once per (user, stage) and keeps the min-ts anchor stable —
    so TOTAL store size grows with distinct-user cardinality for the
    stream's lifetime.  For unbounded user spaces prefer
    :func:`window_funnel_stream`, which carries an opt-in ``state_ttl``
    eviction knob; adding the same knob here would change this
    operator's state schema and is deferred to the next window slot
    (its registered driver row pins the current plan)."""
    stages = list(stages)
    if len(stages) < 1:
        raise ValueError("funnel needs at least one stage")
    n_stages = len(stages)
    within_us = None if within is None else int(float(within) * 1_000_000)

    stage_idx = F.lit(None).cast("int")
    for i in reversed(range(n_stages)):
        stage_idx = F.when(
            F.col(type_col) == F.lit(stages[i]), F.lit(i)
        ).otherwise(stage_idx)

    # project FIRST (a cast after withWatermark strips the watermark
    # tag and EventTimeTimeout refuses the query), then watermark,
    # then the stage filter (which Catalyst pushes below the watermark
    # node anyway — see the clock caveat above)
    src = (
        stream.select(
            F.col(user_col).cast("long").alias("user_id"),
            F.col(ts_col).cast("timestamp").alias("ts"),
            stage_idx.alias("__k"),
        )
        .withWatermark("ts", watermark)
        .where(F.col("__k").isNotNull() & F.col("user_id").isNotNull())
    )

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            k, t1, tlast, buf_ts, buf_k = state.get
            buf_ts, buf_k = list(buf_ts), list(buf_k)
        else:
            k, t1, tlast, buf_ts, buf_k = 0, -1, -1, [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
                for t, sk in zip(ts_us, pdf["__k"]):
                    buf_ts.append(int(t))
                    buf_k.append(int(sk))

        wm_us = state.getCurrentWatermarkMs() * 1000
        sealed = sorted(
            (t, sk) for t, sk in zip(buf_ts, buf_k) if t <= wm_us
        )
        remaining = [
            (t, sk) for t, sk in zip(buf_ts, buf_k) if t > wm_us
        ]
        out = {c: [] for c in ("user_id", "stage_idx", "stage", "reached_at")}
        for t, sk in sealed:
            # compare stage NAMES, not indices: the source maps every
            # event type to its FIRST index in `stages`, so a funnel
            # with a repeated stage type (['view','click','view'])
            # must accept a sealed sk=0 event at k=2 whenever
            # stages[sk] == stages[k] — index equality alone could
            # never reach a later duplicate stage, silently breaking
            # batch equivalence (ADVICE r9)
            if k >= n_stages or stages[sk] != stages[k]:
                continue
            if k == 0:
                pass  # first stage anchors unconditionally (min ts)
            elif t <= tlast:
                continue  # strictly-after
            elif within_us is not None and t > t1 + within_us:
                continue
            tlast = t
            if k == 0:
                t1 = t
            k += 1
            out["user_id"].append(user)
            out["stage_idx"].append(k)
            out["stage"].append(stages[k - 1])
            out["reached_at"].append(pd.Timestamp(t, unit="us"))

        if k == 0 and not remaining:
            state.remove()  # a fresh machine is identical
        else:
            state.update(
                (
                    k,
                    t1,
                    tlast,
                    [t for t, _ in remaining],
                    [sk for _, sk in remaining],
                )
            )
            if remaining:
                # flush as soon as the watermark passes the oldest
                # buffered event (asof-stream discipline)
                state.setTimeoutTimestamp(
                    min(t for t, _ in remaining) // 1000 + 1
                )
        if out["user_id"]:
            yield pd.DataFrame(out)

    return src.groupBy(F.col("user_id")).applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


WINDOW_FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("depth", IntegerType()),
        StructField("reached_at", TimestampType()),
    ]
)

# best = max depth emitted; n_anchors/last_a_us drive the dedupe + cap;
# active chains as parallel (anchor_us, stages-matched, tlast_us)
# arrays; unsealed buffer as in funnel_stream; evict_at_us = event-time
# µs at which a DRAINED user's scalars may be evicted (the state_ttl
# opt-in, ADVICE r11 #1) — -1 = not drained / ttl off
_WF_STATE_SCHEMA = StructType(
    [
        StructField("best", IntegerType()),
        StructField("n_anchors", LongType()),
        StructField("last_a_us", LongType()),
        StructField("a_us", ArrayType(LongType())),
        StructField("a_k", ArrayType(IntegerType())),
        StructField("a_tlast", ArrayType(LongType())),
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_k", ArrayType(IntegerType())),
        StructField("evict_at_us", LongType()),
    ]
)


def window_funnel_stream(
    stream: DataFrame,
    stages: Sequence[str],
    within: float,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    watermark: str = "10 minutes",
    max_anchors_per_user: int | None = None,
    state_ttl: float | None = None,
) -> DataFrame:
    """Live ClickHouse-windowFunnel(strict_increase) twin of
    operators/funnel.window_funnel: every DISTINCT stage-1
    (user, microsecond) event is retried as a window start, and an
    append-mode row (user_id, depth, reached_at) is emitted each time
    a user's MAXIMUM chain depth increases — so per user the emitted
    depths are exactly 1..D for the batch operator's final depth D
    over the sealed events (exactly-once per (user, depth):
    ``best`` is monotone and checkpointed).

    State per user, bounded:
    * three scalars (best depth, anchors created, last anchor µs);
    * the ACTIVE chains — one (anchor_us, matched, tlast_us) triple
      per anchor whose window is still open (anchor + within >
      watermark) and whose chain is incomplete: rate-of-stage-1 ×
      ``within`` bounded, the time-windowed analogue of the batch
      operator's per-user (user, anchor) frame, and additionally
      capped by ``max_anchors_per_user`` (earliest-N in event time —
      the same deterministic semantics as batch, because anchors are
      created from SEALED events in event-time order);
    * the unsealed buffer (events newer than the watermark), the
      funnel_stream bound.
    Completed chains (depth = S) and expired windows are dropped the
    moment they are known such — their contribution lives on in
    ``best``.

    Retention (ADVICE r11 #1): the three SCALARS are kept per user
    FOREVER by default — once a user has emitted any depth (or spent
    anchor-cap budget), ``best``/``n_anchors``/``last_a`` must survive
    so a later event neither re-emits an already-emitted depth
    (breaking exactly-once) nor resets the cap or the same-µs anchor
    dedupe.  "Bounded" above is per-user; TOTAL store size grows with
    distinct-user cardinality for the stream's lifetime.  For unbounded
    user spaces, opt into ``state_ttl`` (seconds of EVENT-TIME
    inactivity): a user whose chains and buffer have fully drained is
    evicted once the watermark passes DRAIN-time + ttl — the
    inactivity clock arms from the watermark at the invocation where
    the user's state fully drains (``evict_at = wm + ttl`` below),
    not from the user's last event timestamp (ADVICE r12 #3 asked for
    doc/impl agreement).  Draining requires the watermark to have
    passed the last open window, so eviction is CONSERVATIVE: never
    earlier than last-activity + ttl, up to one watermark delay
    later.  The trade is the global contract for bounded state — a
    user who RETURNS after eviction is a fresh machine (depths 1..d
    re-emit, cap and dedupe reset), so downstream consumers must
    dedupe on (user, depth) if they need the strict form.  Open
    chains and unsealed buffers are never evicted by the ttl.

    Same clock caveat as every twin here: only STAGE-TYPE events
    advance the watermark (Catalyst pushes the stage filter below the
    EventTimeWatermark node).  The batch operator's ``strict_order``
    mode is deliberately NOT offered live: any-event-interrupts
    semantics would require ingesting the FULL event stream into the
    per-user buffer (state growing with total event rate, and the
    stage-filter watermark contract above no longer applies) — run
    the batch operator over sealed history when consecutive-run
    semantics are needed."""
    stages = list(stages)
    if len(stages) < 1:
        raise ValueError("funnel needs at least one stage")
    if within is None:
        raise ValueError("window_funnel_stream requires a window")
    if max_anchors_per_user is not None and max_anchors_per_user < 1:
        raise ValueError("max_anchors_per_user must be >= 1")
    if state_ttl is not None and float(state_ttl) <= 0:
        raise ValueError("state_ttl must be > 0 seconds")
    n_stages = len(stages)
    within_us = int(float(within) * 1_000_000)
    cap = max_anchors_per_user
    ttl_us = None if state_ttl is None else int(float(state_ttl) * 1_000_000)

    stage_idx = F.lit(None).cast("int")
    for i in reversed(range(n_stages)):
        stage_idx = F.when(
            F.col(type_col) == F.lit(stages[i]), F.lit(i)
        ).otherwise(stage_idx)

    src = (
        stream.select(
            F.col(user_col).cast("long").alias("user_id"),
            F.col(ts_col).cast("timestamp").alias("ts"),
            stage_idx.alias("__k"),
        )
        .withWatermark("ts", watermark)
        .where(F.col("__k").isNotNull() & F.col("user_id").isNotNull())
    )

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            (
                best, n_anchors, last_a,
                a_us, a_k, a_tl, buf_ts, buf_k, evict_at,
            ) = state.get
            a_us, a_k, a_tl = list(a_us), list(a_k), list(a_tl)
            buf_ts, buf_k = list(buf_ts), list(buf_k)
        else:
            best, n_anchors, last_a = 0, 0, -1
            a_us, a_k, a_tl, buf_ts, buf_k = [], [], [], [], []
            evict_at = -1
        wm_us = state.getCurrentWatermarkMs() * 1000
        if ttl_us is not None and 0 <= evict_at <= wm_us:
            # ttl eviction (ADVICE r11 #1): the watermark passed the
            # drained user's inactivity deadline BEFORE this batch —
            # whether this invocation is the timeout itself or a
            # same-batch return, the user starts as a fresh machine
            # (the documented exactly-once trade)
            best, n_anchors, last_a = 0, 0, -1
            evict_at = -1
        got_input = False
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                got_input = True
                ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
                for t, sk in zip(ts_us, pdf["__k"]):
                    buf_ts.append(int(t))
                    buf_k.append(int(sk))
        sealed = sorted(
            (t, sk) for t, sk in zip(buf_ts, buf_k) if t <= wm_us
        )
        remaining = [
            (t, sk) for t, sk in zip(buf_ts, buf_k) if t > wm_us
        ]
        out = {c: [] for c in ("user_id", "depth", "reached_at")}
        for t, sk in sealed:
            name = stages[sk]
            # advance every open chain whose NEXT stage has this name
            # (names, not indices — the repeated-stage contract the
            # plain funnel twin fixed in r10); strictly-after + window
            for i in range(len(a_us)):
                if (
                    a_k[i] < n_stages
                    and stages[a_k[i]] == name
                    and t > a_tl[i]
                    and t <= a_us[i] + within_us
                ):
                    a_k[i] += 1
                    a_tl[i] = t
            # then maybe anchor a new chain (dedupe identical-µs
            # anchors; earliest-N cap counts DISTINCT anchors in
            # event-time order, matching batch)
            if name == stages[0] and t != last_a and (
                cap is None or n_anchors < cap
            ):
                a_us.append(t)
                a_k.append(1)
                a_tl.append(t)
                n_anchors += 1
                last_a = t
            d = max(a_k, default=0)
            while best < d:
                best += 1
                out["user_id"].append(user)
                out["depth"].append(best)
                out["reached_at"].append(pd.Timestamp(t, unit="us"))
            # completed chains cannot grow — drop them now
            if any(k == n_stages for k in a_k):
                keep = [i for i in range(len(a_us)) if a_k[i] < n_stages]
                a_us = [a_us[i] for i in keep]
                a_k = [a_k[i] for i in keep]
                a_tl = [a_tl[i] for i in keep]
        # expired windows: no future sealed event can satisfy
        # t <= anchor + within once the watermark has passed it
        keep = [i for i in range(len(a_us)) if a_us[i] + within_us > wm_us]
        a_us = [a_us[i] for i in keep]
        a_k = [a_k[i] for i in keep]
        a_tl = [a_tl[i] for i in keep]

        drained = not a_us and not remaining
        if best == 0 and n_anchors == 0 and drained:
            state.remove()  # a fresh machine is identical (and the
            # ttl-evicted case reduces to exactly this)
        else:
            if drained and ttl_us is not None:
                # (re)start the inactivity clock; any new input resets
                if got_input or evict_at < 0:
                    evict_at = wm_us + ttl_us
            else:
                evict_at = -1
            state.update(
                (
                    best,
                    n_anchors,
                    last_a,
                    a_us,
                    a_k,
                    a_tl,
                    [t for t, _ in remaining],
                    [sk for _, sk in remaining],
                    evict_at,
                )
            )
            pend = [t for t, _ in remaining] + [
                a + within_us for a in a_us
            ]
            if evict_at >= 0:
                pend.append(evict_at)
            if pend:
                # flush when the watermark passes the oldest buffered
                # event, the next window expiry, or the ttl eviction
                # point (state hygiene)
                state.setTimeoutTimestamp(min(pend) // 1000 + 1)
        if out["user_id"]:
            yield pd.DataFrame(out)

    return src.groupBy(F.col("user_id")).applyInPandasWithState(
        fn,
        outputStructType=WINDOW_FUNNEL_OUTPUT_SCHEMA,
        stateStructType=_WF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


SEQUENCE_COUNT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_matches", IntegerType()),
        StructField("completed_at", TimestampType()),
    ]
)

# the batch machine's three scalars + the unsealed buffer
_SC_STATE_SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("last_t_us", LongType()),  # -1 = unset
        StructField("n", LongType()),
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_k", ArrayType(IntegerType())),
    ]
)


def sequence_count_stream(
    stream: DataFrame,
    stages: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    watermark: str = "10 minutes",
    within: float | None = None,
) -> DataFrame:
    """Live ``sequenceCount`` — the streaming twin of
    operators/funnel.py :func:`~..operators.funnel.sequence_count`:
    one append-mode row per COMPLETED chain, carrying the user's
    cumulative completion count (``n_matches`` is 1, 2, … per user, so
    max(n_matches) per user equals the batch count over the sealed
    events).

    Exact batch equivalence by construction, the funnel_stream
    argument specialized to this machine: events buffer per user until
    the watermark seals them, sealed events fold through the
    single-pass machine in the batch operator's exact ``(t,
    stage-index)`` order, and the machine is PREFIX-STABLE (its
    (k, last_t, n) after a sealed prefix equals the batch machine's
    state over that prefix).  Untracked event types are no-ops on the
    batch machine, so the source filters to tracked types — which also
    means ONLY tracked types advance the watermark (the family's
    documented clock caveat; Catalyst pushes the type filter below the
    EventTimeWatermark node).  ``within`` is the batch knob: seconds
    between CONSECUTIVE matched events (ClickHouse ``(?t<=N)``), reset
    on breach.

    State per user: the machine's three scalars plus the unsealed
    buffer (rate x watermark-delay bounded).  A user at k=0 with n=0
    and an empty buffer is removed (a fresh machine is identical); a
    user with n > 0 keeps the scalars FOREVER — ``n`` is what makes
    emission exactly-once per (user, n_matches) and monotone, the same
    retention posture as funnel_stream (total store size grows with
    converted-user cardinality; a state_ttl hatch like
    window_funnel_stream's would change the state schema and waits for
    a window slot per the r4 hygiene rule)."""
    stages = list(stages)
    if len(stages) < 1:
        raise ValueError("sequence_count needs at least one stage")
    if len(set(stages)) != len(stages):
        raise ValueError("sequence_count stages must be distinct")
    n_stages = len(stages)
    within_us = None if within is None else int(float(within) * 1_000_000)

    stage_idx = F.lit(None).cast("int")
    for i in reversed(range(n_stages)):
        stage_idx = F.when(
            F.col(type_col) == F.lit(stages[i]), F.lit(i)
        ).otherwise(stage_idx)

    src = (
        stream.select(
            F.col(user_col).cast("long").alias("user_id"),
            F.col(ts_col).cast("timestamp").alias("ts"),
            stage_idx.alias("__k"),
        )
        .withWatermark("ts", watermark)
        .where(F.col("__k").isNotNull() & F.col("user_id").isNotNull())
    )

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            k, last_t, n, buf_ts, buf_k = state.get
            buf_ts, buf_k = list(buf_ts), list(buf_k)
        else:
            k, last_t, n, buf_ts, buf_k = 0, -1, 0, [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ts_us = pdf["ts"].astype("int64") // 1000  # ns -> µs
                for t, sk in zip(ts_us, pdf["__k"]):
                    buf_ts.append(int(t))
                    buf_k.append(int(sk))

        wm_us = state.getCurrentWatermarkMs() * 1000
        sealed = sorted(
            (t, sk) for t, sk in zip(buf_ts, buf_k) if t <= wm_us
        )
        remaining = [
            (t, sk) for t, sk in zip(buf_ts, buf_k) if t > wm_us
        ]
        out = {c: [] for c in ("user_id", "n_matches", "completed_at")}
        for t, sk in sealed:
            # stages are distinct by contract, so index equality IS
            # name equality here (unlike funnel_stream's repeated-
            # stage concern)
            if sk != k:
                continue
            if (
                k > 0
                and within_us is not None
                and t - last_t > within_us
            ):
                k, last_t = 0, -1
                continue
            if k == n_stages - 1:
                n += 1
                k, last_t = 0, -1
                out["user_id"].append(user)
                out["n_matches"].append(int(n))
                out["completed_at"].append(pd.Timestamp(t, unit="us"))
            else:
                k, last_t = k + 1, t

        if k == 0 and n == 0 and not remaining:
            state.remove()  # a fresh machine is identical
        else:
            state.update(
                (
                    k,
                    last_t,
                    n,
                    [t for t, _ in remaining],
                    [sk for _, sk in remaining],
                )
            )
            if remaining:
                state.setTimeoutTimestamp(
                    min(t for t, _ in remaining) // 1000 + 1
                )
        if out["user_id"]:
            yield pd.DataFrame(out)

    return src.groupBy(F.col("user_id")).applyInPandasWithState(
        fn,
        outputStructType=SEQUENCE_COUNT_OUTPUT_SCHEMA,
        stateStructType=_SC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
