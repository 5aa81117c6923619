"""top_paths (funnel discovery): hand fixtures for ordering, ties,
short journeys and the deterministic top-n cut, plus a DuckDB twin
replay — the staged row's oracle shape."""

import duckdb
from pyspark.sql import functions as F

from duckdb_imputation_spark.operators.funnel import top_paths


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, tus long, event_type string"
    ).select(
        "user_id", F.timestamp_micros("tus").alias("ts"), "event_type"
    )


def _ddb(rows, max_len=3, top_n=20):
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (u BIGINT, t BIGINT, et VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    return con.execute(f"""
      WITH arr AS (
        SELECT u, list(et ORDER BY t, et) AS es FROM ev GROUP BY u
      ), paths AS (
        SELECT array_to_string(es[1:{max_len}], '>') AS path FROM arr
      )
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n
      FROM paths GROUP BY path
      ORDER BY n DESC, path ASC LIMIT {top_n}
    """).fetchall()


def test_top_paths_fixture_and_twin(spark):
    rows = [
        # two users with the canonical journey, one truncated to 3
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"), (1, 4, "view"),
        (2, 1, "view"), (2, 2, "click"), (2, 3, "purchase"),
        # same-µs tie: error < signup lexicographically
        (3, 5, "signup"), (3, 5, "error"),
        # short journey keeps its natural length
        (4, 9, "view"),
    ]
    got = [
        (r["path"], r["n_users"])
        for r in top_paths(
            _df(spark, rows), "user_id", "ts", "event_type",
            max_len=3, top_n=10,
        ).collect()
    ]
    assert got == [
        ("view>click>purchase", 2),
        ("error>signup", 1),
        ("view", 1),
    ]
    assert got == [(p, n) for p, n in _ddb(rows, top_n=10)]


def test_top_paths_topn_cut_deterministic(spark):
    # three paths tie at n=1: the cut keeps the lexicographically
    # smallest when top_n trims inside the tie class
    rows = [(1, 1, "b"), (2, 1, "c"), (3, 1, "a")]
    got = [
        r["path"]
        for r in top_paths(
            _df(spark, rows), "user_id", "ts", "event_type",
            max_len=1, top_n=2,
        ).collect()
    ]
    assert got == ["a", "b"]
    assert [p for p, _ in _ddb(rows, max_len=1, top_n=2)] == ["a", "b"]


def test_top_paths_validation():
    import pytest

    with pytest.raises(ValueError, match="max_len"):
        top_paths(None, "u", "t", "e", max_len=0)
    with pytest.raises(ValueError, match="top_n"):
        top_paths(None, "u", "t", "e", top_n=0)
