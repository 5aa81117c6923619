"""SCD2 history maintenance (operators/scd.py): version chaining,
consecutive-duplicate collapse, NULL-safe change detection, closed-row
pass-through, snapshot reconstruction."""

import pytest
from pyspark.sql import functions as F

from duckdb_imputation_spark.operators.scd import scd2_apply, scd2_snapshot_at


def _rows(df):
    return {
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in df.collect()
    }


def test_initial_load_chains_versions_and_collapses_duplicates(spark):
    upd = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "a", 20),  # duplicate of previous -> collapsed
            (1, "b", 30),
            (2, "x", 15),
        ],
        "k int, v string, ts int",
    )
    out = scd2_apply(None, upd, ["k"], ["v"], "ts")
    assert _rows(out) == {
        (1, "a", 10, 30),
        (1, "b", 30, None),
        (2, "x", 15, None),
    }


def test_merge_closes_current_keeps_closed_and_unchanged(spark):
    hist = spark.createDataFrame(
        [
            (1, "a", 0, 5),      # closed row: must pass through verbatim
            (1, "b", 5, None),   # current for key 1
            (2, "x", 0, None),   # current for key 2 (no update arrives)
            (3, "p", 0, None),   # current for key 3 (unchanged update)
        ],
        "k int, v string, valid_from int, valid_to int",
    )
    upd = spark.createDataFrame(
        [
            (1, "b", 7),   # unchanged vs current -> no-op
            (1, "c", 9),   # change -> closes (5, None) at 9
            (3, "p", 8),   # unchanged -> no-op
            (4, "n", 6),   # brand-new key
        ],
        "k int, v string, ts int",
    )
    out = scd2_apply(hist, upd, ["k"], ["v"], "ts")
    assert _rows(out) == {
        (1, "a", 0, 5),
        (1, "b", 5, 9),
        (1, "c", 9, None),
        (2, "x", 0, None),
        (3, "p", 0, None),
        (4, "n", 6, None),
    }


def test_null_tracked_values_are_null_safe(spark):
    hist = spark.createDataFrame(
        [(1, None, 0, None)], "k int, v string, valid_from int, valid_to int"
    )
    upd = spark.createDataFrame(
        [(1, None, 5), (1, "a", 9), (2, None, 3)],
        "k int, v string, ts int",
    )
    out = scd2_apply(hist, upd, ["k"], ["v"], "ts")
    # NULL -> NULL unchanged; NULL -> 'a' is a change; new key opening
    # with NULL tracked value still creates its first version
    assert _rows(out) == {
        (1, None, 0, 9),
        (1, "a", 9, None),
        (2, None, 3, None),
    }


def test_multi_tracked_and_multi_key_columns(spark):
    upd = spark.createDataFrame(
        [
            (1, "eu", "a", 1, 10),
            (1, "eu", "a", 2, 20),  # second tracked col changes
            (1, "us", "a", 1, 15),  # different key (k, region)
        ],
        "k int, region string, v string, tier int, ts int",
    )
    out = scd2_apply(None, upd, ["k", "region"], ["v", "tier"], "ts")
    got = {
        (r["k"], r["region"], r["v"], r["tier"], r["valid_from"],
         r["valid_to"])
        for r in out.collect()
    }
    assert got == {
        (1, "eu", "a", 1, 10, 20),
        (1, "eu", "a", 2, 20, None),
        (1, "us", "a", 1, 15, None),
    }


def test_snapshot_at_reconstructs_past_state(spark):
    upd = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 30), (2, "x", 15)],
        "k int, v string, ts int",
    )
    hist = scd2_apply(None, upd, ["k"], ["v"], "ts")
    at20 = {
        (r["k"], r["v"]) for r in scd2_snapshot_at(hist, 20).collect()
    }
    assert at20 == {(1, "a"), (2, "x")}
    at30 = {
        (r["k"], r["v"]) for r in scd2_snapshot_at(hist, 30).collect()
    }
    assert at30 == {(1, "b"), (2, "x")}
    at5 = scd2_snapshot_at(hist, 5).count()
    assert at5 == 0


def test_null_key_or_ts_raises(spark):
    upd = spark.createDataFrame(
        [(None, "a", 10)], "k int, v string, ts int"
    )
    with pytest.raises(Exception, match="scd2_apply"):
        scd2_apply(None, upd, ["k"], ["v"], "ts").collect()
    upd2 = spark.createDataFrame(
        [(1, "a", None)], "k int, v string, ts int"
    )
    with pytest.raises(Exception, match="scd2_apply"):
        scd2_apply(None, upd2, ["k"], ["v"], "ts").collect()


def test_validation_errors(spark):
    upd = spark.createDataFrame([(1, "a", 10)], "k int, v string, ts int")
    with pytest.raises(ValueError, match="key_cols"):
        scd2_apply(None, upd, [], ["v"], "ts")
    with pytest.raises(ValueError, match="tracked_cols"):
        scd2_apply(None, upd, ["k"], [], "ts")


def test_null_valid_from_current_row_still_closes(spark):
    """A current row with NULL valid_from ("since the beginning of
    time") must behave as a PRESENT current version: an unchanged
    update collapses, a change closes it — never a double-open
    (review r8: join-hit detection must not ride valid_from)."""
    hist = spark.createDataFrame(
        [(1, "a", None, None), (2, "p", None, None)],
        "k int, v string, valid_from int, valid_to int",
    )
    upd = spark.createDataFrame(
        [(1, "a", 5), (1, "b", 9), (2, "p", 7)],
        "k int, v string, ts int",
    )
    out = scd2_apply(hist, upd, ["k"], ["v"], "ts")
    assert _rows(out) == {
        (1, "a", None, 9),   # closed at the first REAL change
        (1, "b", 9, None),
        (2, "p", None, None),  # unchanged update -> untouched
    }
    # exactly one open version per key
    opens = [r for r in out.collect() if r["valid_to"] is None]
    assert sorted(r["k"] for r in opens) == [1, 2]
