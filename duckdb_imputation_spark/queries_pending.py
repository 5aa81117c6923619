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

from .sources import load_table

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


# --------------------------------------------------------------------- #
# Staged r14 row 1: sequence_count_events (ClickHouse sequenceCount     #
# chain-pattern parity — operators/funnel.py sequence_count, new r13).  #
# --------------------------------------------------------------------- #


def _sequence_count_fold_sql(
    stages: "list[str]", within_us: "int | None"
) -> str:
    """DuckDB replay of sequence_count's single-pass machine as a
    RECURSIVE-CTE automaton: events get a per-user step number
    (``row_number() OVER (PARTITION BY u ORDER BY t, si)`` — the
    operator's exact tie order), and the recursion advances every
    user's (k next-expected stage, lt last matched time, n
    completions) state one event per level; the final state is the
    row at each user's event count.

    Why not ``list_reduce`` (the cusum/ewma oracle idiom): DuckDB
    1.0.0's list_reduce returns WRONG results for this lambda under
    multi-row evaluation — the SAME literal list folds to the correct
    answer in a 1-row query and to a different answer when co-batched
    with rows of other lengths; struct, HUGEINT and BIGINT
    accumulators all reproduce it.  Found by this row's fuzz twin
    while the Spark fold and the pure-Python machine agreed;
    tests/test_sequence_count.py pins a 3-row minimal repro as a
    canary (if DuckDB ever fixes it, the canary fails and the
    recursive machine may be rewritten as a fold).

    Emits CTEs ending in ``counts(u, n_matches)``; callers must open
    with ``WITH RECURSIVE``.
    """
    if len(stages) < 1:
        raise ValueError("sequence_count needs at least one stage")
    case = " ".join(
        f"WHEN '{s}' THEN {i}" for i, s in enumerate(stages)
    )
    last = len(stages) - 1
    gap = (
        "FALSE"
        if within_us is None
        else f"(s.t - m.lt) > {int(within_us)}"
    )
    return f"""
    base AS (
      SELECT user_id AS u, epoch_us(ts) AS t,
             CASE event_type {case} ELSE -1 END AS si
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL
    ), seq AS (
      SELECT u, t, si,
             row_number() OVER (PARTITION BY u ORDER BY t, si) AS rn
      FROM base
    ), nev AS (
      SELECT u, COUNT(*) AS cnt FROM seq GROUP BY u
    ), machine AS (
      SELECT u, CAST(0 AS BIGINT) AS rn, 0 AS k,
             CAST(NULL AS BIGINT) AS lt, CAST(0 AS BIGINT) AS n
      FROM nev
      UNION ALL
      SELECT m.u, s.rn,
        CASE WHEN s.si < 0 OR s.si != m.k THEN m.k
             WHEN m.k > 0 AND {gap} THEN 0
             WHEN m.k = {last} THEN 0
             ELSE m.k + 1 END AS k,
        CASE WHEN s.si < 0 OR s.si != m.k THEN m.lt
             WHEN m.k > 0 AND {gap} THEN CAST(NULL AS BIGINT)
             WHEN m.k = {last} THEN CAST(NULL AS BIGINT)
             ELSE s.t END AS lt,
        CASE WHEN s.si >= 0 AND s.si = m.k AND m.k = {last}
                  AND NOT (m.k > 0 AND {gap})
             THEN m.n + 1 ELSE m.n END AS n
      FROM machine m JOIN seq s ON s.u = m.u AND s.rn = m.rn + 1
    ), counts AS (
      SELECT m.u, m.n AS n_matches
      FROM machine m JOIN nev ON nev.u = m.u AND m.rn = nev.cnt
    )"""


_SEQ_COUNT_STAGES = ["view", "click", "purchase"]
_SEQ_COUNT_WITHIN_S = 86400.0  # adjacent-gap bound, ClickHouse (?t<=N):
# 24 h discriminates on the testdata (1 h zeroes every user; None seldom
# resets) — the histogram exercises BOTH the gap-reset and the counting


def _sequence_count_oracle(sf_dir: str) -> str:
    fold = _sequence_count_fold_sql(
        _SEQ_COUNT_STAGES, int(_SEQ_COUNT_WITHIN_S * 1_000_000)
    )
    return f"""
    WITH RECURSIVE {fold}
    SELECT CAST(n_matches AS INT) AS n_matches,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM counts GROUP BY n_matches
    """


@_pending("sequence_count_events", oracle=_sequence_count_oracle)
def sequence_count_events(spark, sf):
    """ClickHouse ``sequenceCount('(?1)(?t<=86400)(?2)(?t<=86400)(?3)')``
    parity over the events table (operators/funnel.py sequence_count,
    new in r13): per user, the number of NON-OVERLAPPING
    view->click->purchase completions under a 24-hour adjacent-gap
    bound, counted by the documented deterministic single-pass machine
    ((t, stage-index) order, expected-type advance, gap reset,
    count+reset on completion), histogrammed to (n_matches, n_users).
    The oracle replays the identical machine as a recursive-CTE
    automaton — NOT as a list_reduce fold, because DuckDB 1.0.0's
    list_reduce misfolds this lambda under multi-row evaluation, a
    real engine bug this row's fuzz twin found
    (tests/test_sequence_count.py pins a 3-row minimal repro; see
    _sequence_count_fold_sql).  All-integer output, zero
    float surface.  Scale shape: ONE keyed collect_list + a JVM
    aggregate fold (the ewma/cusum family — per-user series in one
    task, max_series the named-error guard), then a <=O(distinct
    counts) histogram aggregate."""
    from pyspark.sql import functions as F

    from .operators.funnel import sequence_count

    ev = load_table(spark, sf, "events")
    out = sequence_count(
        ev,
        "user_id",
        "ts",
        "event_type",
        _SEQ_COUNT_STAGES,
        within=_SEQ_COUNT_WITHIN_S,
    )
    return out.groupBy(
        F.col("n_matches").cast("int").alias("n_matches")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


# --------------------------------------------------------------------- #
# Staged r14 row 2: sequence_count_stream_events — the live             #
# sequenceCount twin's driver row (streaming/funnel_stream.py           #
# sequence_count_stream, new r13, batch-equivalence tested).            #
# --------------------------------------------------------------------- #


def _sequence_count_stream_oracle(sf_dir: str) -> str:
    fold = _sequence_count_fold_sql(
        _SEQ_COUNT_STAGES, int(_SEQ_COUNT_WITHIN_S * 1_000_000)
    )
    # the stream emits one row per COMPLETION, so users with zero
    # completions never appear — the batch histogram restricted to
    # n_matches >= 1
    return f"""
    WITH RECURSIVE {fold}
    SELECT CAST(n_matches AS INT) AS n_matches,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM counts WHERE n_matches > 0 GROUP BY n_matches
    """


@_pending(
    "sequence_count_stream_events", oracle=_sequence_count_stream_oracle
)
def sequence_count_stream_events(spark, sf):
    """The LIVE sequenceCount twin end to end (streaming/
    funnel_stream.py sequence_count_stream on applyInPandasWithState,
    EventTimeTimeout) — the family's proven availableNow pattern: the
    events table replays as TWO files through ONE checkpoint (split at
    the timestamp midpoint, so run 2 recovers run 1's machine scalars
    and unsealed buffer from the state store) and a stage-type
    sentinel under an excluded user a day past the horizon advances
    the final watermark so every buffer seals.  Per user the emitted
    completion rows carry cumulative counts exactly 1..N for the batch
    sequence_count N, so max(n_matches) per user histogrammed must
    equal the batch row's histogram restricted to n >= 1 — the same
    recursive-CTE oracle as sequence_count_events with a positive
    filter.  All-integer output, zero float surface."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .queries import _session_scratch
    from .streaming.funnel_stream import sequence_count_stream

    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_type"
    ).where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    lo_us, hi_us = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    mid = F.timestamp_micros(F.lit((lo_us + hi_us) // 2))
    hi = F.timestamp_micros(F.lit(hi_us))
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("user_id"),
        (hi + F.expr("INTERVAL 1 DAY")).alias("ts"),
        F.lit(_SEQ_COUNT_STAGES[0]).alias("event_type"),
    )
    tmp = tempfile.mkdtemp(prefix="sc_stream_row_")
    outdir = f"{_session_scratch('sc_stream_out_')}/out"
    try:
        src = f"{tmp}/src"
        os.makedirs(src)
        halves = [
            ev.where(F.col("ts") <= F.lit(mid)),
            ev.where(F.col("ts") > F.lit(mid)).unionByName(sentinel),
        ]
        for i, half in enumerate(halves):
            half.coalesce(1).write.parquet(f"{tmp}/h{i}")
            part = [
                f
                for f in os.listdir(f"{tmp}/h{i}")
                if f.endswith(".parquet")
            ][0]
            shutil.copy(f"{tmp}/h{i}/{part}", f"{src}/half{i}.parquet")
            stream = spark.readStream.schema(halves[0].schema).parquet(src)
            q = (
                sequence_count_stream(
                    stream,
                    _SEQ_COUNT_STAGES,
                    within=_SEQ_COUNT_WITHIN_S,
                    watermark="10 minutes",
                )
                .writeStream.format("parquet")
                .option("path", outdir)
                .option("checkpointLocation", f"{tmp}/cp")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = spark.read.parquet(outdir).where(F.col("user_id") >= 0)
        return (
            out.groupBy("user_id")
            .agg(F.max("n_matches").cast("int").alias("n_matches"))
            .groupBy("n_matches")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------- #
# Staged r14 row 3: top_event_paths_events (operators/funnel.py         #
# top_paths, new r13 — the funnel-discovery / flow-analysis view).      #
# --------------------------------------------------------------------- #

_TOP_PATHS_ORACLE = """
    WITH base AS (
      SELECT user_id AS u, epoch_us(ts) AS t, event_type AS et
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL
    ), arr AS (
      SELECT u, list(et ORDER BY t, et) AS es FROM base GROUP BY u
    ), paths AS (
      SELECT array_to_string(es[1:3], '>') AS path FROM arr
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path ASC LIMIT 20
    """


@_pending("top_event_paths_events", oracle=_TOP_PATHS_ORACLE)
def top_event_paths_events(spark, sf):
    """Top-20 opening event paths (operators/funnel.py top_paths, new
    r13): each user's first THREE event types in (ts, type) order
    joined with '>' — the funnel-DISCOVERY view (which ordered
    journeys actually happen) that precedes choosing funnel stages.
    Deterministic end to end: equal-µs ties break lexicographically on
    the type name and the cut orders by (n_users DESC, path ASC) — a
    total order, so the top-20 SET is exact; output is one string and
    one exact BIGINT per row, zero rounding surface.  The oracle is
    the same journey list built with DuckDB's ordered list aggregate,
    sliced and joined identically.  Scale shape: one keyed
    collect_list of slim (µs, type) structs, a JVM
    slice/transform/array_join projection, ONE map-side-combined
    GROUP BY on <= |types|^3 path strings, and a TakeOrdered top-20."""
    from .operators.funnel import top_paths

    ev = load_table(spark, sf, "events")
    return top_paths(
        ev, "user_id", "ts", "event_type", max_len=3, top_n=20
    )
