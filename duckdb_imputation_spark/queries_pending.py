"""Staged r13 catalog registrations (VERDICT r11 Next #4 and #7).

The r12 driver window is fully owed to evidence rotation (zero new
registrations — see ``queries._ROTATION_BUDGET_NOTE``), so the four
rows queued for r13 are built and parity-checked HERE this round and
move into ``queries.py`` + ``_DRIVER_PRIORITY`` the moment r13's
window opens.  Everything below follows the registered catalog's
conventions exactly — same (spark, sf_dir) factory signature, same
DuckDB-oracle disciplines (integer milli grids, epoch-µs timestamps,
sequential float folds, driver-baked constants shared between row and
oracle factory) — so promotion is a cut-and-paste plus a window slot.

Parity gate: tests/test_pending_rows.py replays each row against its
oracle at sf0.001 (CI) and the round-close rehearsal replays at
sf0.01 (the driver's gate SF).
"""

from __future__ import annotations

from pyspark.sql import functions as F

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
# 1. window_funnel_stream_events — the live windowFunnel twin's driver  #
#    row (streaming/funnel_stream.py window_funnel_stream, built r11,   #
#    batch-equivalence fuzz-tested; VERDICT r11 missing #2).            #
# --------------------------------------------------------------------- #

_WINDOW_FUNNEL_DEPTH_ORACLE = """
    WITH base AS (
      SELECT user_id AS u, epoch_us(ts) AS t, event_type AS et
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL
    ), a AS (
      SELECT u, t AS anchor FROM base WHERE et = 'view'
    ), f2 AS (
      SELECT b.u, a.anchor, MIN(b.t) AS t2
      FROM base b JOIN a ON b.u = a.u
      WHERE b.et = 'click' AND b.t > a.anchor
        AND b.t <= a.anchor + 28800000000
      GROUP BY b.u, a.anchor
    ), f3 AS (
      SELECT b.u, f2.anchor, MIN(b.t) AS t3
      FROM base b JOIN f2 ON b.u = f2.u
      WHERE b.et = 'purchase' AND b.t > f2.t2
        AND b.t <= f2.anchor + 28800000000
      GROUP BY b.u, f2.anchor
    ), lv AS (
      SELECT u, 1 AS lvl FROM a
      UNION ALL SELECT u, 2 FROM f2
      UNION ALL SELECT u, 3 FROM f3
    ), d AS (
      SELECT u, MAX(lvl) AS depth FROM lv GROUP BY u
    )
    SELECT CAST(depth AS INT) AS depth, CAST(COUNT(*) AS BIGINT)
             AS n_users
    FROM d GROUP BY depth
    """


@_pending("window_funnel_stream_events", oracle=_WINDOW_FUNNEL_DEPTH_ORACLE)
def window_funnel_stream_events(spark, sf):
    """The LIVE windowFunnel twin end to end (streaming/funnel_stream.py
    window_funnel_stream on applyInPandasWithState, EventTimeTimeout) —
    the funnel_stream row's proven availableNow pattern: the events
    table replays as TWO files through ONE checkpoint (split at the
    timestamp midpoint, so run 2 recovers run 1's chain state and
    unsealed buffers from the state store) and a stage-type sentinel
    under an excluded user a day past the horizon advances the final
    watermark so every armed timeout fires and every real chain seals.
    Per user the emitted depth-increase rows are exactly 1..D for the
    batch window_funnel depth D, so max(depth) per user histogrammed
    must equal the batch row's (depth, n_users) histogram — which is
    exactly the window_funnel_events oracle (identical CTE chain,
    8-hour window, every stage-1 event retried as an anchor).
    All-integer output, zero float surface."""
    import os
    import shutil
    import tempfile

    from .queries import _session_scratch
    from .streaming.funnel_stream import window_funnel_stream

    stages = ["view", "click", "purchase"]
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
        F.lit("view").alias("event_type"),
    )
    tmp = tempfile.mkdtemp(prefix="wf_stream_row_")
    outdir = f"{_session_scratch('wf_stream_out_')}/out"
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
                window_funnel_stream(
                    stream,
                    stages,
                    within=28800.0,
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
            .agg(F.max("depth").cast("int").alias("depth"))
            .groupBy("depth")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------- #
# 2. per_class_calibration_events — classwise reliability bins          #
#    (ml/eval.py per_class_calibration_curve, built r11, law-tested;    #
#    VERDICT r11 missing #2).                                           #
# --------------------------------------------------------------------- #

_PER_CLASS_CAL_ORACLE = """
    WITH base AS (
      SELECT event_type AS label, user_id, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND user_id IS NOT NULL AND event_id IS NOT NULL
    ), m AS (
      SELECT 'view' AS class, v % 1001 AS pm,
             CASE WHEN label = 'view' THEN 1 ELSE 0 END AS y FROM base
      UNION ALL
      SELECT 'click', user_id % 1001,
             CASE WHEN label = 'click' THEN 1 ELSE 0 END FROM base
      UNION ALL
      SELECT 'purchase', event_id % 1001,
             CASE WHEN label = 'purchase' THEN 1 ELSE 0 END FROM base
      UNION ALL
      SELECT 'signup', (v + user_id) % 1001,
             CASE WHEN label = 'signup' THEN 1 ELSE 0 END FROM base
      UNION ALL
      SELECT 'error', (v + event_id) % 1001,
             CASE WHEN label = 'error' THEN 1 ELSE 0 END FROM base
    ), b AS (
      SELECT class,
             GREATEST(LEAST(
               CAST((pm * 10 - (pm * 10) % 1000) / 1000 AS INT), 9), 0)
               AS bin,
             pm, y
      FROM m
    )
    SELECT class, bin, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(CAST(SUM(pm) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * 1000.0)
                 * 1000000.0) / 1000000.0 AS confidence,
           ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS accuracy
    FROM b GROUP BY class, bin
    """


@_pending("per_class_calibration_events", oracle=_PER_CLASS_CAL_ORACLE)
def per_class_calibration_events(spark, sf):
    """Per-class (classwise) reliability bins over the five event types
    (ml/eval.py per_class_calibration_curve — Kull et al. 2019, the
    other half of the multiclass calibration family next to
    top_label_calibration_events): each class's deterministic milli
    probability (the auc_ovr scoring recipe, shared with the top-label
    row) scored one-vs-rest against the event_type indicator.  One
    inline-array explode (no per-class union branches in the Spark
    plan) → ONE map-side-combined GROUP BY to ≤ 5·n_bins exact-BIGINT
    cells on the shared both-ends-clamped milli bin; the oracle's
    UNION ALL is the same melt expressed relationally."""
    from .ml.eval import per_class_calibration_curve

    ev = load_table(spark, sf, "events").where(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    )
    v = F.round(F.col("value") * 100).cast("long")
    uid, eid = F.col("user_id"), F.col("event_id")
    frame = ev.select(
        F.col("event_type").alias("label"),
        ((v % 1001).cast("double") / 1000.0).alias("p_view"),
        ((uid % 1001).cast("double") / 1000.0).alias("p_click"),
        ((eid % 1001).cast("double") / 1000.0).alias("p_purchase"),
        (((v + uid) % 1001).cast("double") / 1000.0).alias("p_signup"),
        (((v + eid) % 1001).cast("double") / 1000.0).alias("p_error"),
    )
    return per_class_calibration_curve(
        frame,
        "label",
        ["p_view", "p_click", "p_purchase", "p_signup", "p_error"],
        classes=["view", "click", "purchase", "signup", "error"],
        n_bins=10,
    )


# --------------------------------------------------------------------- #
# 3. streaming_calibration_events — the live calibration monitor's      #
#    availableNow twin row (streaming/eval_stream.py                    #
#    streaming_calibration_counts, built r11, law-tested; VERDICT r11   #
#    missing #2).                                                       #
# --------------------------------------------------------------------- #

_STREAMING_CAL_ORACLE = """
    WITH s AS (
      SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) AS window_us,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(ROUND(value * 100) AS BIGINT) % 1001 AS pm
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND ts IS NOT NULL
    ), b AS (
      SELECT window_us,
             GREATEST(LEAST(
               CAST((pm * 10 - (pm * 10) % 1000) / 1000 AS INT), 9), 0)
               AS bin,
             y, pm
      FROM s
    )
    SELECT window_us, bin, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(pm) AS BIGINT) AS spm
    FROM b GROUP BY window_us, bin
    """


@_pending("streaming_calibration_events", oracle=_STREAMING_CAL_ORACLE)
def streaming_calibration_events(spark, sf):
    """The streaming calibration monitor end to end (streaming/
    eval_stream.py streaming_calibration_counts): the
    calibration_value_purchase recipe (purchase indicator vs cents mod
    1001 milli probability) over hourly event-time windows, replayed
    as TWO files through ONE checkpoint with a far-future sentinel
    sealing every real window in run 2 — so the append-mode cells must
    equal ONE batch GROUP BY (hour window, clamped milli bin) over the
    whole table, which is exactly the oracle (Spark's window() and the
    oracle's epoch-µs modulus are both epoch-hour-aligned).  Cells are
    exact BIGINTs (n, n_pos, Σpm); window starts leave as epoch µs.
    Sentinel hygiene: the sentinel's own window never seals (nothing
    follows it), and the output filter keeps only windows at or below
    the real data's horizon."""
    import os
    import shutil
    import tempfile

    from .queries import _session_scratch
    from .streaming.eval_stream import streaming_calibration_counts

    ev = load_table(spark, sf, "events").where(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    )
    v = F.round(F.col("value") * 100).cast("long")
    frame = ev.select(
        F.col("ts"),
        (F.col("event_type") == F.lit("purchase"))
        .cast("int")
        .alias("label"),
        ((v % 1001).cast("double") / 1000.0).alias("p"),
    )
    lo_us, hi_us = frame.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    mid = F.timestamp_micros(F.lit((lo_us + hi_us) // 2))
    hi = F.timestamp_micros(F.lit(hi_us))
    sentinel = spark.range(1).select(
        (hi + F.expr("INTERVAL 30 DAY")).alias("ts"),
        F.lit(0).cast("int").alias("label"),
        F.lit(0.5).cast("double").alias("p"),
    )
    tmp = tempfile.mkdtemp(prefix="cal_stream_row_")
    outdir = f"{_session_scratch('cal_stream_out_')}/out"
    try:
        src = f"{tmp}/src"
        os.makedirs(src)
        halves = [
            frame.where(F.col("ts") <= F.lit(mid)),
            frame.where(F.col("ts") > F.lit(mid)).unionByName(sentinel),
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
                streaming_calibration_counts(
                    stream,
                    "label",
                    "p",
                    ts_col="ts",
                    window="1 hour",
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
        out = spark.read.parquet(outdir)
        return out.select(
            F.unix_micros("window_start").alias("window_us"),
            "bin",
            "n",
            "n_pos",
            "spm",
        ).where(F.col("window_us") <= F.lit(hi_us))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------- #
# 4. window_funnel_strict_order_events — hash evidence for the one      #
#    funnel mode that only had unit-level DuckDB twins (VERDICT r11     #
#    missing #3: "a registered row if a slot frees").                   #
# --------------------------------------------------------------------- #

_STRICT_ORDER_ORACLE = """
    WITH base AS (
      SELECT user_id AS u, epoch_us(ts) AS t, event_type AS et,
             CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
                  WHEN 'purchase' THEN 2 ELSE -1 END AS sk
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IS NOT NULL
    ), anchors AS (
      SELECT DISTINCT u, t AS a FROM base WHERE et = 'view'
    ), lv1 AS (
      SELECT u, a, a AS t1 FROM anchors
    ), lv2 AS (
      SELECT u, a, t1,
        (SELECT CASE WHEN b.et = 'click' THEN b.t END
         FROM base b
         WHERE b.u = lv1.u AND b.t > lv1.t1
           AND b.t <= lv1.a + 28800000000
         ORDER BY b.t, b.sk LIMIT 1) AS t2
      FROM lv1
    ), lv3 AS (
      SELECT u, a, t1, t2,
        (SELECT CASE WHEN b.et = 'purchase' THEN b.t END
         FROM base b
         WHERE b.u = lv2.u AND b.t > lv2.t2
           AND b.t <= lv2.a + 28800000000
         ORDER BY b.t, b.sk LIMIT 1) AS t3
      FROM lv2
    ), d AS (
      SELECT u, MAX(1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
                      + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)
               AS depth
      FROM lv3 GROUP BY u
    )
    SELECT CAST(depth AS INT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM d GROUP BY depth
    """


@_pending("window_funnel_strict_order_events", oracle=_STRICT_ORDER_ORACLE)
def window_funnel_strict_order_events(spark, sf):
    """ClickHouse windowFunnel(strict_order) over the events table —
    the consecutive-chain mode (ANY interleaving event stops a chain,
    tracked or not) that until now faced DuckDB only in unit fixtures
    (tests/test_funnel_eval.py's hand + fuzz twins): every stage-1
    event retried as an 8-hour window start, each level advancing only
    when the FIRST event of any type after the previous link (ties at
    an identical microsecond break to the smallest stage index,
    untracked events smallest of all — deterministic where ClickHouse
    is undefined) carries the expected stage name.  The oracle replays
    the same per-anchor machine with correlated first-event-after-link
    ORDER BY t, sk LIMIT 1 subqueries; depth folds to one row per user
    and histograms — all-integer output, zero float surface.  Honest
    cost note (operators/funnel.py): strict_order levels join the FULL
    event frame, the price of any-event-interrupts."""
    from .operators.funnel import window_funnel

    ev = load_table(spark, sf, "events")
    out = window_funnel(
        ev,
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
        within=28800.0,
        strict_order=True,
    )
    return out.groupBy(F.col("depth").cast("int").alias("depth")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# --------------------------------------------------------------------- #
# 5. ann_recall_batch — the query_col batch form of ann_recall_at_k     #
#    (VERDICT r11 missing #4 / Next #7): mean recall over 3 probe       #
#    queries, the shape a real recall benchmark takes.                  #
# --------------------------------------------------------------------- #


def _probe_vecs() -> "list[list[float]]":
    """Three deterministic unit probe queries (dim 64): the fixed
    synthetic sin vector every single-query ANN row uses, plus cos- and
    sin(2i)-derived companions — data- and SF-independent so the SQL
    oracle can inline them, each normalized with the SAME numpy ops the
    row uses (the shared-bits discipline)."""
    import numpy as np

    idx = np.arange(1, 65, dtype=np.float64)
    out = []
    for raw in (np.sin(idx), np.cos(idx), np.sin(2.0 * idx)):
        v = np.asarray(raw, dtype=np.float64)
        out.append(list(v / np.linalg.norm(v)))
    return out


def _ann_recall_batch_oracle(sf_dir: str) -> str:
    """Batch-recall oracle: per probe query, the exact cosine top-10
    truth plus each variant's top-10 replayed in SQL — int8 through the
    parameterized quantized twin, dim16 through a 16-dim fold with the
    query renormalized on the SLICED prefix (mirroring _cosine's
    renormalization on the Spark side) — then ONE join + GROUP BY
    counts (qid, vec_id) overlaps; recall_pm divides by the truth
    frame's total row count (the r12 denominator contract)."""
    import numpy as np

    from .ml.sql_twin import flit
    from .queries import (
        _quantized_topk_oracle,
        _self_fold_sql,
        _seq_fold_sql,
    )

    def vlit(v) -> str:
        return "[" + ", ".join(flit(float(x)) for x in v) + "]"

    truth_parts, tagged_parts = [], []
    for qid, q in enumerate(_probe_vecs()):
        qa = np.asarray(q, dtype=np.float64)
        q2 = qa / np.linalg.norm(qa)
        cos = (
            f"ROUND({_seq_fold_sql(vlit(q2))}"
            f" / sqrt({_self_fold_sql()}), 6)"
        )
        truth_parts.append(
            f"SELECT {qid} AS qid, vec_id FROM ("
            f"SELECT vec_id, {cos} AS score FROM embeddings "
            f"ORDER BY score DESC, vec_id LIMIT 10) t{qid}"
        )
        q16 = qa[:16]
        q16_2 = q16 / np.linalg.norm(q16)
        cos16 = (
            f"ROUND({_seq_fold_sql(vlit(q16_2), dim=16)}"
            f" / sqrt({_self_fold_sql(dim=16)}), 6)"
        )
        tagged_parts.append(
            f"SELECT 'int8' AS variant, {qid} AS qid, vec_id "
            f"FROM ({_quantized_topk_oracle(list(q))}) i{qid}"
        )
        tagged_parts.append(
            f"SELECT 'dim16', {qid}, vec_id FROM ("
            f"SELECT vec_id, {cos16} AS score FROM embeddings "
            f"ORDER BY score DESC, vec_id LIMIT 10) d{qid}"
        )
    truth = "\n      UNION ALL ".join(truth_parts)
    tagged = "\n      UNION ALL ".join(tagged_parts)
    return f"""
    WITH truth AS (
      {truth}
    ), tagged AS (
      {tagged}
    ), scored AS (
      SELECT g.variant,
             CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM tagged g LEFT JOIN truth t
        ON g.qid = t.qid AND g.vec_id = t.vec_id
    )
    SELECT variant, CAST(10 AS INT) AS k,
           CAST((SELECT COUNT(DISTINCT qid) FROM truth) AS BIGINT)
             AS n_queries,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS truth_n,
           CAST(COUNT(*) AS BIGINT) AS returned,
           CAST(COALESCE(SUM(hit), 0) AS BIGINT) AS hits,
           CAST(ROUND(COALESCE(SUM(hit), 0) * 1000.0
                / (SELECT COUNT(*) FROM truth)) AS BIGINT) AS recall_pm
    FROM scored GROUP BY variant
    """


@_pending("ann_recall_batch", oracle=_ann_recall_batch_oracle)
def ann_recall_batch(spark, sf):
    """Mean recall@10 over THREE probe queries — the batch
    (``query_col``) form of ann_recall_at_k, the shape a real recall
    benchmark takes (VERDICT r11 missing #4): per query, exact cosine
    top-10 truth vs two prunings with exact SQL twins — int8 scalar
    quantization (expected ≈ 1000 pm, the lossless-in-practice
    baseline) and a 16-of-64 dimension truncation (a genuine cheap-ANN
    ablation whose recall is interesting).  Matches join on (query,
    id); recall_pm = hits·1000 / truth_n with truth_n the truth
    frame's total row count (the r12 denominator contract), so a
    variant that skips a query is penalized in the shared denominator.
    Scale shape: 2·3 TakeOrdered top-k frames tagged + unioned, 30
    truth ids broadcast, ONE left equi-join + ONE groupBy + a 1-row
    truth-count broadcast — nothing corpus-sized shuffles."""
    from .operators import simsearch as _ss

    e = load_table(spark, sf, "embeddings")
    e16 = e.select(
        "vec_id", F.slice("embedding", 1, 16).alias("embedding")
    )
    truth = None
    int8 = None
    dim16 = None
    for qid, q in enumerate(_probe_vecs()):
        t = _ss.cosine_topk(e, q, k=10).select(
            F.lit(qid).alias("qid"), "vec_id"
        )
        i8 = _ss.quantized_cosine_topk(e, q, k=10).select(
            F.lit(qid).alias("qid"), "vec_id"
        )
        d16 = _ss.cosine_topk(e16, list(q)[:16], k=10).select(
            F.lit(qid).alias("qid"), "vec_id"
        )
        truth = t if truth is None else truth.unionByName(t)
        int8 = i8 if int8 is None else int8.unionByName(i8)
        dim16 = d16 if dim16 is None else dim16.unionByName(d16)
    return _ss.ann_recall_at_k(
        truth,
        {"int8": int8, "dim16": dim16},
        id_col="vec_id",
        k=10,
        query_col="qid",
    )
