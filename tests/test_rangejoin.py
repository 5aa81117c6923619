"""range_join: bucketed equi-join formulation of interval containment.

Reference surface: DuckDB's IEJoin / range-join physical operator
(``a.x BETWEEN b.lo AND b.hi``, SURVEY §2.3); checked here against a
pure-Python nested-loop reference and for its plan shape (must be an
equi-join — no BroadcastNestedLoopJoin / CartesianProduct)."""

import pytest

from pyspark.sql import functions as F

from duckdb_imputation_spark.operators.rangejoin import range_join
from duckdb_imputation_spark.plans import executed_plan, lint_plan


@pytest.fixture(scope="module")
def points(spark):
    rows = [(i, i % 3, float(i)) for i in range(30)]
    return spark.createDataFrame(rows, "pid int, k int, x double")


@pytest.fixture(scope="module")
def intervals(spark):
    # per key: one short, one long, one degenerate (lo == hi), one empty
    rows = []
    for k in range(3):
        rows += [
            (100 + k, k, 2.0, 5.0),     # short
            (200 + k, k, 0.0, 25.0),    # long (spans many buckets)
            (300 + k, k, 7.0, 7.0),     # degenerate point interval
            (400 + k, k, 9.0, 8.0),     # empty (lo > hi): matches nothing
        ]
    return spark.createDataFrame(rows, "iid int, k int, lo double, hi double")


def _reference(points, intervals, keyed=True):
    out = set()
    for pid, pk, x in points:
        for iid, ik, lo, hi in intervals:
            if (not keyed or pk == ik) and lo <= x <= hi:
                out.add((pid, iid))
    return out


def _pairs(df):
    return {(r.pid, r.iid) for r in df.select("pid", "iid").collect()}


@pytest.mark.parametrize("width", [1.0, 3.0, 100.0])
def test_matches_nested_loop_reference(spark, points, intervals, width):
    prows = [(r.pid, r.k, r.x) for r in points.collect()]
    irows = [(r.iid, r.k, r.lo, r.hi) for r in intervals.collect()]
    got = range_join(
        points, intervals, "x", "lo", "hi", on="k", bucket_width=width
    )
    assert _pairs(got) == _reference(prows, irows)
    # each qualifying pair appears EXACTLY once regardless of width
    assert got.count() == len(_reference(prows, irows))


def test_no_keys_cross_product_semantics(spark, points, intervals):
    prows = [(r.pid, r.k, r.x) for r in points.collect()]
    irows = [(r.iid, r.k, r.lo, r.hi) for r in intervals.collect()]
    got = range_join(
        points.drop("k"),
        intervals.drop("k"),
        "x",
        "lo",
        "hi",
        bucket_width=4.0,
    )
    assert _pairs(got) == _reference(prows, irows, keyed=False)


def test_closed_bounds_and_degenerate_interval(spark):
    p = spark.createDataFrame([(1, 5.0), (2, 7.0), (3, 7.0001)], "pid int, x double")
    iv = spark.createDataFrame([(10, 5.0, 7.0)], "iid int, lo double, hi double")
    got = _pairs(range_join(p, iv, "x", "lo", "hi", bucket_width=2.0))
    assert got == {(1, 10), (2, 10)}  # both endpoints inclusive, 7.0001 out


def test_left_join_pads_unmatched(spark, points, intervals):
    got = range_join(
        points, intervals, "x", "lo", "hi", on="k", bucket_width=3.0, how="left"
    )
    # every left point survives at least once
    assert got.select("pid").distinct().count() == points.count()
    unmatched = got.filter(F.col("iid").isNull())
    # x >= 26: outside every interval (long ones end at 25)
    assert {r.pid for r in unmatched.select("pid").collect()} == {26, 27, 28, 29}


def test_auto_width(points, intervals):
    got = range_join(points, intervals, "x", "lo", "hi", on="k")
    prows = [(r.pid, r.k, r.x) for r in points.collect()]
    irows = [(r.iid, r.k, r.lo, r.hi) for r in intervals.collect()]
    assert _pairs(got) == _reference(prows, irows)


def test_span_cap_raises(spark, points, intervals):
    with pytest.raises(Exception, match="spans .* buckets"):
        range_join(
            points,
            intervals,
            "x",
            "lo",
            "hi",
            on="k",
            bucket_width=1.0,
            max_span_buckets=4,
        ).collect()


def test_ambiguous_columns_rejected(spark, points):
    iv = points.select("pid", F.col("x").alias("lo"), (F.col("x") + 1).alias("hi"))
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(points, iv, "x", "lo", "hi")


def test_plan_is_equi_join(spark, points, intervals):
    got = range_join(points, intervals, "x", "lo", "hi", on="k", bucket_width=3.0)
    got.collect()  # finalize AQE plan
    plan = executed_plan(got)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert [f for f in lint_plan(got) if f.severity == "error"] == []


def test_stream_static_range_join(spark, tmp_path):
    """The bucketed formulation is stream-compatible: a streaming point
    source equi-joins a STATIC interval table (stream-static equi-joins
    are supported; the naive theta-join formulation is not) — output
    must equal the batch range_join on the same data."""
    points = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "pid int, k int, x double"
    )
    intervals = spark.createDataFrame(
        [(100 + k, k, 2.0, 5.0) for k in range(3)]
        + [(200 + k, k, 0.0, 25.0) for k in range(3)],
        "iid int, k int, lo double, hi double",
    )
    src = str(tmp_path / "pts")
    points.write.parquet(src)
    stream = spark.readStream.schema(points.schema).parquet(src)
    out = range_join(stream, intervals, "x", "lo", "hi", on="k", bucket_width=3.0)
    q = (
        out.writeStream.format("memory")
        .queryName("rj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.pid, r.iid)
        for r in spark.sql("SELECT pid, iid FROM rj_stream").collect()
    }
    want = _pairs(
        range_join(points, intervals, "x", "lo", "hi", on="k", bucket_width=3.0)
    )
    assert got == want and len(want) > 0


def test_timestamp_columns_accepted(spark):
    """timestamp / timestamp_ntz point+interval columns work directly
    (epoch-second buckets) — no manual cast required."""
    p = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00"), (2, "2024-01-01 13:00:00")],
        "pid int, ts string",
    ).select("pid", F.col("ts").cast("timestamp_ntz").alias("ts"))
    iv = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "iid int, lo string, hi string",
    ).select(
        "iid",
        F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"),
    )
    got = range_join(p, iv, "ts", "lo", "hi", bucket_width=3600.0)
    assert {(r.pid, r.iid) for r in got.collect()} == {(1, 10)}


def test_null_points_and_keys(spark):
    """NULL point or key never matches (SQL BETWEEN/equi-join
    semantics); with how='left' such rows still surface, NULL-padded."""
    p = spark.createDataFrame(
        [(1, 0, 3.0), (2, 0, None), (3, None, 3.0)],
        "pid int, k int, x double",
    )
    iv = spark.createDataFrame(
        [(10, 0, 2.0, 5.0)], "iid int, k int, lo double, hi double"
    )
    inner = range_join(p, iv, "x", "lo", "hi", on="k", bucket_width=2.0)
    assert {(r.pid, r.iid) for r in inner.collect()} == {(1, 10)}
    left = range_join(p, iv, "x", "lo", "hi", on="k", bucket_width=2.0, how="left")
    got = {(r.pid, r.iid) for r in left.collect()}
    assert got == {(1, 10), (2, None), (3, None)}


def _overlap_reference(lrows, rrows, keyed=True):
    out = set()
    for lid, lk, llo, lhi in lrows:
        for rid, rk, rlo, rhi in rrows:
            if (not keyed or lk == rk) and llo <= rhi and rlo <= lhi:
                out.add((lid, rid))
    return out


@pytest.mark.parametrize("width", [1.0, 3.0, 50.0])
def test_interval_overlap_join_matches_reference(spark, width):
    from duckdb_imputation_spark.operators.rangejoin import interval_overlap_join

    lrows = [
        (1, 0, 0.0, 10.0), (2, 0, 5.0, 6.0), (3, 0, 20.0, 30.0),
        (4, 1, 0.0, 3.0), (5, 1, 8.0, 8.0), (6, 0, 9.0, 7.0),  # empty
    ]
    rrows = [
        (10, 0, 9.0, 12.0), (11, 0, 6.0, 6.0), (12, 0, 31.0, 40.0),
        (13, 1, 3.0, 8.0), (14, 1, 50.0, 60.0),
    ]
    l = spark.createDataFrame(lrows, "lid int, k int, llo double, lhi double")
    r = spark.createDataFrame(rrows, "rid int, k int, rlo double, rhi double")
    got = interval_overlap_join(
        l, r, "llo", "lhi", "rlo", "rhi", on="k", bucket_width=width
    )
    pairs = [(row.lid, row.rid) for row in got.collect()]
    assert set(pairs) == _overlap_reference(lrows, rrows)
    assert len(pairs) == len(set(pairs))  # exactly-once emission


def test_interval_overlap_join_no_keys_and_plan(spark):
    from duckdb_imputation_spark.operators.rangejoin import interval_overlap_join

    lrows = [(1, 0, 0.0, 4.0), (2, 0, 10.0, 14.0)]
    rrows = [(10, 0, 3.0, 11.0)]
    l = spark.createDataFrame(lrows, "lid int, k int, llo double, lhi double").drop("k")
    r = spark.createDataFrame(rrows, "rid int, k int, rlo double, rhi double").drop("k")
    got = interval_overlap_join(l, r, "llo", "lhi", "rlo", "rhi", bucket_width=4.0)
    got.collect()
    assert {(x.lid, x.rid) for x in got.collect()} == {(1, 10), (2, 10)}
    plan = executed_plan(got)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert [f for f in lint_plan(got) if f.severity == "error"] == []


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    width=st.sampled_from([0.7, 2.0, 9.0]),
)
def test_range_join_matches_reference_hypothesis(spark, data, width):
    """Random points/intervals (incl. negatives, duplicates, degenerate
    and empty intervals) against the nested-loop reference, any width."""
    nums = st.floats(min_value=-20, max_value=20, allow_nan=False)
    pts = data.draw(
        st.lists(st.tuples(st.integers(0, 2), nums), min_size=1, max_size=25)
    )
    ivs = data.draw(
        st.lists(
            st.tuples(st.integers(0, 2), nums, nums), min_size=1, max_size=15
        )
    )
    prows = [(i, k, float(x)) for i, (k, x) in enumerate(pts)]
    irows = [(100 + i, k, float(lo), float(hi)) for i, (k, lo, hi) in enumerate(ivs)]
    p = spark.createDataFrame(prows, "pid int, k int, x double")
    iv = spark.createDataFrame(irows, "iid int, k int, lo double, hi double")
    got = _pairs(
        range_join(p, iv, "x", "lo", "hi", on="k", bucket_width=width)
    )
    assert got == _reference(prows, irows)
