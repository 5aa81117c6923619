"""sequence_count (ClickHouse sequenceCount chain-pattern parity):
hand fixtures for every machine transition, a pure-Python reference
replayed under a µs-collision fuzz, and the DuckDB recursive-CTE twin
— the strict_order discipline (a second engine replaying the same
deterministic machine) applied to the new operator before it ever
takes a catalog slot.  Building the twin found a real DuckDB engine
bug (list_reduce misfolds under multi-row evaluation); the canary
below pins the minimal repro."""

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_imputation_spark.operators.funnel import sequence_count

STAGES = ["view", "click", "purchase"]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, tus long, event_type string"
    ).select(
        "user_id", F.timestamp_micros("tus").alias("ts"), "event_type"
    )


def _py_ref(rows, stages, within_us=None):
    """Pure-Python replay of the documented machine: single pass in
    (t, stage-index) order (untracked si=-1 smallest), expected-type
    advance, adjacent-gap reset, count+reset on completion."""
    sidx = {s: i for i, s in enumerate(stages)}
    by_user = {}
    for u, t, et in rows:
        by_user.setdefault(u, []).append((t, sidx.get(et, -1)))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        k, last_t, n = 0, None, 0
        for t, si in evs:
            if si < 0 or si != k:
                continue
            if k > 0 and within_us is not None and t - last_t > within_us:
                k, last_t = 0, None
                continue
            if k == len(stages) - 1:
                k, last_t, n = 0, None, n + 1
            else:
                k, last_t = k + 1, t
        out[u] = n
    return out


def _ddb_con(rows):
    """The test rows as an ``events`` view (user_id, ts TIMESTAMP from
    µs, event_type) so the STAGED ROW's own fold SQL runs verbatim."""
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (u BIGINT, t BIGINT, et VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    con.execute(
        "CREATE VIEW events AS SELECT u AS user_id,"
        " make_timestamp(t) AS ts, et AS event_type FROM ev"
    )
    return con


def _ddb_twin(rows, stages, within_us=None):
    """The staged catalog row's recursive-CTE automaton (see
    queries._sequence_count_fold_sql for why it is not a
    list_reduce fold)."""
    from duckdb_imputation_spark.queries import (
        _sequence_count_fold_sql,
    )

    fold = _sequence_count_fold_sql(stages, within_us)
    sql = f"WITH RECURSIVE {fold} SELECT u, n_matches FROM counts"
    return {
        int(u): int(n) for u, n in _ddb_con(rows).execute(sql).fetchall()
    }


@pytest.mark.skipif(
    duckdb.__version__ != "1.0.0",
    reason="bug canary pinned to the container's DuckDB",
)
def test_duckdb_list_reduce_multirow_bug_canary():
    """WHY the sequence_count oracle is a recursive-CTE automaton and
    not a list_reduce fold: DuckDB 1.0.0's ``list_reduce`` returns a
    WRONG result for this lambda under multi-row evaluation.  Minimal
    repro (delta-debugged from the staged row's fuzz twin, then value-
    normalized — magnitude-independent): the 5-event list below folds
    to 0 completed view->click->purchase chains in a 1-row query (the
    correct answer: no click ever occurs) but to 1 when the SAME
    literal list is co-batched with two companion rows of lengths 3
    and 1.  Struct and HUGEINT accumulators reproduce identically;
    the companion order matters (companions-first triggers it), which
    smells like lambda state bleeding across vector lanes of unequal
    list lengths.  The repo's long-green list_reduce oracles (cusum,
    ewma, ANN folds) evaluate per-row over slices of one array and
    have hash-matched Spark for rounds — this canary guards the
    specific multi-list regime.  If this test FAILS, the engine bug
    was fixed: the recursive machine in
    queries._sequence_count_fold_sql may be rewritten as a
    readable fold."""
    con = duckdb.connect()
    # events (t, stage_index): view, untracked, untracked, view,
    # purchase — packed e = t*8 + si + 1, machine acc packed the same
    # way the delta-debugged original was
    lst = [t * 8 + si + 1 for t, si in
           [(1, 0), (5, -1), (8, -1), (12, 0), (30, 2)]]
    lam = """(acc, e) -> CASE
      WHEN (e % 8) - 1 < 0 OR (e % 8) - 1 != acc % 8 THEN acc
      WHEN acc % 8 > 0
           AND ((e // 8) - ((acc % 72057594037927936) // 8 - 1)) > 10
        THEN acc - (acc % 72057594037927936)
      WHEN acc % 8 = 2
        THEN acc - (acc % 72057594037927936) + 72057594037927936
      ELSE acc - (acc % 72057594037927936) + ((e // 8) + 1) * 8
           + acc % 8 + 1
    END"""
    lit = "[" + ",".join(map(str, lst)) + "]"
    single = con.execute(
        f"SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"{lit}::BIGINT[]), {lam}) // 72057594037927936"
    ).fetchone()[0]
    multi = dict(
        con.execute(
            f"""WITH r(u, es) AS (VALUES (1, [1,2,3]::BIGINT[]),
                 (2, {lit}::BIGINT[]), (3, [9]::BIGINT[]))
            SELECT u, list_reduce(list_prepend(CAST(0 AS BIGINT), es),
                       {lam}) // 72057594037927936
            FROM r ORDER BY u"""
        ).fetchall()
    )[2]
    assert single == 0  # correct: the stream contains no click at all
    assert multi != single, (
        "DuckDB's list_reduce now folds this list identically alone "
        "and co-batched — the engine bug this canary pins appears "
        "fixed; the recursive-CTE oracle machine can become a fold"
    )


def _spark_counts(spark, rows, within=None):
    return {
        r["user_id"]: r["n_matches"]
        for r in sequence_count(
            _df(spark, rows), "user_id", "ts", "event_type", STAGES,
            within=within,
        ).collect()
    }


def test_hand_fixture_every_transition(spark):
    rows = [
        # user 1: complete chain, then a gap-reset chain
        (1, 100, "view"), (1, 200, "click"), (1, 250, "view"),
        (1, 300, "purchase"), (1, 400, "view"), (1, 5000, "click"),
        (1, 5100, "purchase"),
        # user 2: out-of-order stage ignored, untracked ignored
        (2, 10, "purchase"), (2, 20, "view"), (2, 30, "signup"),
        (2, 40, "click"), (2, 50, "purchase"),
        # user 3: two disjoint completions back to back
        (3, 1, "view"), (3, 2, "click"), (3, 3, "purchase"),
        (3, 4, "view"), (3, 5, "click"), (3, 6, "purchase"),
        # user 4: never starts
        (4, 1, "click"), (4, 2, "purchase"),
    ]
    got = _spark_counts(spark, rows, within=0.001)  # 1000 µs gap bound
    assert got == {1: 1, 2: 1, 3: 2, 4: 0}
    assert got == _py_ref(rows, STAGES, within_us=1000)
    assert got == _ddb_twin(rows, STAGES, within_us=1000)
    unbounded = _spark_counts(spark, rows)
    assert unbounded == {1: 2, 2: 1, 3: 2, 4: 0}
    assert unbounded == _py_ref(rows, STAGES)
    assert unbounded == _ddb_twin(rows, STAGES)


def test_equal_microsecond_tie_breaks_to_stage_index(spark):
    # view and click at the SAME microsecond: the (t, si) order
    # processes view first, so the click at the same instant advances
    # the chain the view just opened.
    rows = [(1, 100, "click"), (1, 100, "view"), (1, 200, "purchase")]
    got = _spark_counts(spark, rows)
    assert got == {1: 1}
    assert got == _py_ref(rows, STAGES)
    assert got == _ddb_twin(rows, STAGES)


def test_validation():
    with pytest.raises(ValueError, match="distinct"):
        sequence_count(None, "u", "t", "e", ["a", "a"])
    with pytest.raises(ValueError, match="at least one"):
        sequence_count(None, "u", "t", "e", [])


def test_fuzz_vs_python_and_duckdb(spark):
    """Randomized streams with heavy µs collisions: Spark fold ==
    pure-Python machine == DuckDB list_reduce twin, with and without
    the adjacent-gap bound."""
    import random

    rng = random.Random(1307)
    types = STAGES + ["signup", "error"]
    for trial in range(6):
        rows = [
            (
                rng.randrange(5),
                rng.randrange(30),  # dense µs collisions
                rng.choice(types),
            )
            for _ in range(rng.randrange(10, 60))
        ]
        for within, win_us in ((None, None), (5e-6, 5)):
            exp = _py_ref(rows, STAGES, within_us=win_us)
            got = _spark_counts(spark, rows, within=within)
            assert got == exp, (trial, within, rows)
            assert _ddb_twin(rows, STAGES, within_us=win_us) == exp, (
                trial, within,
            )


def test_sequence_count_stream_matches_batch(spark, tmp_path):
    """Live sequenceCount twin: completion rows over out-of-order
    micro-batches; per user max(n_matches) must equal the batch
    sequence_count, the emitted counts are exactly 1..N (exactly-once,
    monotone), and the gap-reset fires identically live."""
    import pandas as pd

    from duckdb_imputation_spark.streaming.funnel_stream import (
        sequence_count_stream,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")

    def T(seconds):
        return (base + pd.Timedelta(seconds=seconds)).to_pydatetime()

    rows = [
        # u1: two completions, the second's click arrives EARLY (file
        # order) relative to its view — buffering must reorder
        (1, T(0), "view"), (1, T(10), "click"), (1, T(20), "purchase"),
        (1, T(50), "click"), (1, T(40), "view"), (1, T(60), "purchase"),
        # u2: gap reset — the click misses the 30 s adjacent bound,
        # then a fresh chain completes
        (2, T(0), "view"), (2, T(45), "click"),
        (2, T(100), "view"), (2, T(110), "click"), (2, T(120), "purchase"),
        # u3: mid-chain stage-1 events are passed over, chain completes
        (3, T(0), "view"), (3, T(5), "view"), (3, T(10), "click"),
        (3, T(15), "purchase"),
        # u4: never completes
        (4, T(0), "view"), (4, T(5), "click"),
    ]
    edf = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    src = str(tmp_path / "sc")
    edf.filter("ts > timestamp'2024-01-01 00:00:42'").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    edf.filter("ts <= timestamp'2024-01-01 00:00:42'").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    for s in (100000, 100060):  # watermark nudges under excluded user
        spark.createDataFrame(
            [(99, T(s), "view")],
            "user_id long, ts timestamp, event_type string",
        ).coalesce(1).write.mode("append").parquet(src)

    es = (
        spark.readStream.schema(edf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sequence_count_stream(
        es, STAGES, within=30.0, watermark="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r.user_id, r.n_matches)
        for r in spark.sql("SELECT * FROM sc_stream").collect()
        if r.user_id != 99
    ]
    assert len(got) == len(set(got))  # exactly-once per (user, n)
    got_max = {}
    for u, nn in got:
        got_max[u] = max(got_max.get(u, 0), nn)
    for u, nn in got_max.items():
        assert {(u, i) for i in range(1, nn + 1)} <= set(got)
    batch_rows = [(u, int(t.value // 1000), et) for u, t, et in (
        (u, pd.Timestamp(ts), et) for u, ts, et in rows if u != 99
    )]
    want_all = _py_ref(batch_rows, STAGES, within_us=30_000_000)
    want = {u: n for u, n in want_all.items() if n > 0}
    assert got_max == want
    assert want[1] == 2 and want[2] == 1 and want[3] == 1  # the fixtures


def test_sequence_match_existence(spark):
    """within=None: matched iff the chain occurs as a subsequence
    (greedy-earliest is existence-optimal without time bounds)."""
    from duckdb_imputation_spark.operators.funnel import sequence_match

    rows = [
        (1, 1, "view"), (1, 2, "signup"), (1, 3, "click"), (1, 4, "purchase"),
        (2, 1, "purchase"), (2, 2, "click"), (2, 3, "view"),  # wrong order
        (3, 1, "view"), (3, 2, "click"),                       # incomplete
    ]
    got = {
        r["user_id"]: r["matched"]
        for r in sequence_match(
            _df(spark, rows), "user_id", "ts", "event_type", STAGES
        ).collect()
    }
    assert got == {1: 1, 2: 0, 3: 0}


def test_sequence_count_stream_fuzz_matches_batch(spark, tmp_path):
    """Seeded random events with out-of-order file arrival and µs-tie
    collisions: the live twin's per-user max(n_matches) equals the
    batch sequence_count exactly, emissions are 1..N per user and
    exactly-once — the windowFunnel stream-fuzz discipline on the new
    machine."""
    import random

    import pandas as pd

    from duckdb_imputation_spark.operators.funnel import sequence_count
    from duckdb_imputation_spark.streaming.funnel_stream import (
        sequence_count_stream,
    )

    rng = random.Random(1307)
    base = pd.Timestamp("2024-01-01 00:00:00")
    types = STAGES + ["signup", "error"]
    rows = []
    for u in range(1, 11):
        for _ in range(rng.randint(0, 25)):
            rows.append(
                (
                    u,
                    (base + pd.Timedelta(seconds=rng.randint(0, 900)))
                    .to_pydatetime(),
                    rng.choice(types),
                )
            )
    edf = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    src = str(tmp_path / "scf")
    # shuffle arrival: even users' events land in file 1, odd in file 2
    edf.filter("user_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    edf.filter("user_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    for s in (100000, 100060):
        spark.createDataFrame(
            [(99, (base + pd.Timedelta(seconds=s)).to_pydatetime(), "view")],
            "user_id long, ts timestamp, event_type string",
        ).coalesce(1).write.mode("append").parquet(src)

    es = (
        spark.readStream.schema(edf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sequence_count_stream(
            es, STAGES, within=120.0, watermark="1 minute"
        )
        .writeStream.format("memory")
        .queryName("sc_fuzz")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r.user_id, r.n_matches)
        for r in spark.sql("SELECT * FROM sc_fuzz").collect()
        if r.user_id != 99
    ]
    assert len(got) == len(set(got))  # exactly-once
    got_max = {}
    for u, nn in got:
        got_max[u] = max(got_max.get(u, 0), nn)
    for u, nn in got_max.items():
        assert {(u, i) for i in range(1, nn + 1)} <= set(got)
    want = {
        r["user_id"]: r["n_matches"]
        for r in sequence_count(
            edf, "user_id", "ts", "event_type", STAGES, within=120.0
        ).collect()
        if r["n_matches"] > 0 and r["user_id"] != 99
    }
    assert got_max == want
    assert sum(want.values()) > 0  # the fixture actually converts
