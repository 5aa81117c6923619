"""The two-pass shard-offset prefix-sum pattern (operators/prefix.py):
bit-equality with the single-partition global window it replaces, shard
invariance, and the distinct-EXCEPT multiplicity semantics fix."""

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_imputation_spark.operators import textprep as tp
from duckdb_imputation_spark.operators.prefix import (
    global_row_number,
    global_running_sum,
    order_preserving_shards,
)


@pytest.fixture(scope="module")
def toy(spark):
    # skewed ids + duplicate-free, values 1..7 cycling
    rows = [(i * i % 997, (i % 7) + 1) for i in range(500)]
    rows = list({r[0]: r for r in rows}.values())  # unique ids
    return spark.createDataFrame(rows, "id long, tok int").cache()


def _global_window_running(df, exclusive):
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum("tok").over(w)
    if exclusive:
        run = run - F.col("tok")
    return {r["id"]: r["r"] for r in df.withColumn("r", run.cast("long")).collect()}


@pytest.mark.parametrize("n_shards", [1, 3, 8, 64])
@pytest.mark.parametrize("exclusive", [False, True])
def test_global_running_sum_matches_window(toy, n_shards, exclusive):
    want = _global_window_running(toy, exclusive)
    got = {
        r["id"]: r["__running"]
        for r in global_running_sum(
            toy, "id", "tok", n_shards, exclusive=exclusive
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_shards", [1, 5, 32])
def test_global_row_number_matches_window(toy, n_shards):
    w = Window.partitionBy(F.lit(0)).orderBy("id")
    want = {
        r["id"]: r["rn"]
        for r in toy.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    }
    got = {
        r["id"]: r["__rn"]
        for r in global_row_number(toy, "id", n_shards).collect()
    }
    assert got == want


def test_shards_preserve_order(toy):
    sharded, bounds = order_preserving_shards(toy, "id", 8)
    rows = sorted(
        (r["id"], r["__shard"]) for r in sharded.collect()
    )
    shards = [s for _, s in rows]
    assert shards == sorted(shards)  # non-decreasing along id order
    assert bounds == sorted(bounds)


def test_pack_sequences_global_path_matches_window(toy):
    got = {
        r["id"]: r["bin"]
        for r in tp.pack_sequences(toy, "tok", "id", 16).collect()
    }
    run = _global_window_running(toy, exclusive=True)
    want = {i: run[i] // 16 for i in run}
    assert got == want


def test_pack_sequences_empty_input(spark):
    df = spark.createDataFrame([], "id long, tok int")
    assert tp.pack_sequences(df, "tok", "id", 16).count() == 0


def test_except_distinct_multiplicity_semantics(spark):
    """Left multiplicity > right: distinct EXCEPT still excludes the
    value.  Guards the intersect_except_parts fix (exceptAll().distinct()
    kept it; the data at sf0.001-0.1 never triggers the difference)."""
    left = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    right = spark.createDataFrame([("a",)], "v string")
    got = sorted(r["v"] for r in left.subtract(right).collect())
    con = duckdb.connect()
    exp = sorted(
        r[0]
        for r in con.execute(
            "SELECT v FROM (VALUES ('a'),('a'),('b')) t(v) "
            "EXCEPT SELECT 'a'"
        ).fetchall()
    )
    assert got == exp == ["b"]
    # the old formulation really is wrong on this input
    wrong = sorted(
        r["v"] for r in left.exceptAll(right).distinct().collect()
    )
    assert wrong == ["a", "b"]


@pytest.mark.parametrize("n_shards", [1, 4, 32])
def test_global_row_number_tiebreaks(spark, n_shards):
    """Composite order (primary numeric + string tiebreak) with HEAVY
    primary ties — the zipfian-vocabulary shape: many rows share the
    lowest count and must rank alphabetically within the tie class."""
    rows = [(f"tok{i:04d}", -float(1 + (3 if i < 5 else 1 if i % 2 else 2)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "token string, negc double")
    w = Window.partitionBy(F.lit(0)).orderBy("negc", "token")
    want = {
        r["token"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    }
    got = {
        r["token"]: r["__rn"]
        for r in global_row_number(
            df, "negc", n_shards, tiebreak_cols=["token"]
        ).collect()
    }
    assert got == want


def test_build_vocabulary_no_topk_matches_window(spark):
    """top_k=None path: shard-offset ranking must equal the naive global
    window bit-for-bit, including the count=1 tie class."""
    from duckdb_imputation_spark.plans import lint_plan

    docs = [(i, " ".join(f"w{j}" for j in range(i % 17 + 1))) for i in range(300)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    v = tp.build_vocabulary(df, "text")
    assert [f for f in lint_plan(v) if f.severity == "error"] == []
    counts = (
        df.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("count"), F.col("token"))
    want = sorted(
        counts.withColumn("token_id", F.row_number().over(w).cast("long")).collect()
    )
    assert sorted(v.collect()) == want


def test_equidepth_histogram_ntile_sizes(spark):
    """Bucket sizes must be NTILE's: first (n mod k) buckets ceil(n/k),
    rest floor(n/k) — here 23 rows into 5 buckets -> 5,5,5,4,4."""
    from duckdb_imputation_spark.operators.prefix import equidepth_histogram

    df = spark.createDataFrame([(i,) for i in range(23)], "v long")
    out = {
        r["bucket"]: (r["n_rows"], r["min_value"], r["max_value"])
        for r in equidepth_histogram(df, "v", 5, n_shards=4).collect()
    }
    assert [out[b][0] for b in sorted(out)] == [5, 5, 5, 4, 4]
    # contiguous, ordered ranges
    bounds = [out[b][1:] for b in sorted(out)]
    assert bounds == [(0, 4), (5, 9), (10, 14), (15, 18), (19, 22)]


def test_equidepth_histogram_fewer_rows_than_buckets(spark):
    from duckdb_imputation_spark.operators.prefix import equidepth_histogram

    df = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    out = {
        r["bucket"]: r["n_rows"]
        for r in equidepth_histogram(df, "v", 10, n_shards=2).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}  # n<k: one row per leading bucket


def test_equidepth_histogram_matches_duckdb_ntile_randomized(spark):
    """Random (n, k, duplicate-heavy values): bucket aggregates must
    equal DuckDB NTILE's for every draw — the cross-engine form of the
    invariance argument (ties are interchangeable, aggregates are
    not)."""
    import random as _r

    import duckdb

    from duckdb_imputation_spark.operators.prefix import equidepth_histogram

    rng = _r.Random(47)
    for trial in range(4):
        n = rng.randrange(5, 120)
        k = rng.choice([3, 7, 10, 16])
        rows = [(rng.randrange(0, 12), i) for i in range(n)]  # heavy ties
        df = spark.createDataFrame(rows, "v long, rid long")
        got = {
            r["bucket"]: (r["n_rows"], r["min_value"], r["max_value"])
            for r in equidepth_histogram(
                df, "v", k, tiebreak_cols=["rid"], n_shards=4
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t(v BIGINT, rid BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        exp = {
            b: (c, lo, hi)
            for b, c, lo, hi in con.execute(
                f"""SELECT bucket, COUNT(*), MIN(v), MAX(v) FROM (
                      SELECT v, NTILE({k}) OVER (ORDER BY v, rid) AS bucket
                      FROM t) GROUP BY bucket"""
            ).fetchall()
        }
        assert got == exp, (trial, n, k)


def test_percent_rank_global_matches_window_form(spark):
    """Bit-identical to PERCENT_RANK() OVER (ORDER BY v), ties and
    all — on data deliberately full of tie classes."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.prefix import percent_rank_global

    rng = random.Random(9)
    rows = [(i, float(rng.randrange(12))) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: r["pct_rank"]
        for r in percent_rank_global(df, "v", n_shards=5).collect()
    }
    w = Window.orderBy("v")
    exp = {
        r["id"]: r["pr"]
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    assert got == exp


def test_percent_rank_global_single_row_and_constant(spark):
    from duckdb_imputation_spark.operators.prefix import percent_rank_global

    one = spark.createDataFrame([(1, 5.0)], "id long, v double")
    assert percent_rank_global(one, "v", n_shards=2).collect()[0][
        "pct_rank"
    ] == 0.0
    const = spark.createDataFrame(
        [(i, 7.0) for i in range(10)], "id long, v double"
    )
    out = percent_rank_global(const, "v", n_shards=3).collect()
    assert all(r["pct_rank"] == 0.0 for r in out)  # one tie class


def test_percent_rank_global_no_single_partition_window(spark):
    from duckdb_imputation_spark.operators.prefix import percent_rank_global
    from duckdb_imputation_spark.plans import lint_plan

    df = spark.range(1000).selectExpr("id", "CAST(id % 37 AS DOUBLE) AS v")
    out = percent_rank_global(df, "v", n_shards=4)
    out.collect()
    errs = [f for f in lint_plan(out) if f.severity == "error"]
    assert not errs, errs


def test_ranking_family_matches_window_forms(spark):
    """rank / dense_rank / cume_dist against the classic window forms
    on tie-heavy data — the full global ranking family is bit-exact."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.prefix import (
        cume_dist_global,
        dense_rank_global,
        rank_global,
    )

    rng = random.Random(17)
    rows = [(i, float(rng.randrange(9))) for i in range(250)]
    df = spark.createDataFrame(rows, "id long, v double")
    w = Window.orderBy("v")
    exp = {
        r["id"]: (r["rk"], r["dr"], r["cd"])
        for r in df.select(
            "id",
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("dr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    rk = {r["id"]: r["rank"] for r in rank_global(df, "v", 4).collect()}
    dr = {
        r["id"]: r["dense_rank"]
        for r in dense_rank_global(df, "v", 4).collect()
    }
    cd = {
        r["id"]: r["cume_dist"]
        for r in cume_dist_global(df, "v", 4).collect()
    }
    for i in exp:
        assert (rk[i], dr[i], cd[i]) == exp[i]


def test_ranking_family_lint_clean(spark):
    from duckdb_imputation_spark.operators.prefix import (
        cume_dist_global,
        dense_rank_global,
        rank_global,
    )
    from duckdb_imputation_spark.plans import lint_plan

    df = spark.range(500).selectExpr("id", "CAST(id % 23 AS DOUBLE) AS v")
    for fn in (rank_global, dense_rank_global, cume_dist_global):
        out = fn(df, "v", 3)
        out.collect()
        errs = [f for f in lint_plan(out) if f.severity == "error"]
        assert not errs, (fn.__name__, errs)


def test_global_ranks_fused_matches_individual_ops(spark):
    import random

    from duckdb_imputation_spark.operators.prefix import (
        cume_dist_global,
        dense_rank_global,
        global_ranks,
        percent_rank_global,
        rank_global,
    )

    rng = random.Random(23)
    rows = [(i, float(rng.randrange(11))) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double")
    fused = {
        r["id"]: (r["rank"], r["dense_rank"], r["pct_rank"], r["cume_dist"])
        for r in global_ranks(df, "v", 4).collect()
    }
    rk = {r["id"]: r["rank"] for r in rank_global(df, "v", 4).collect()}
    dr = {
        r["id"]: r["dense_rank"]
        for r in dense_rank_global(df, "v", 4).collect()
    }
    pr = {
        r["id"]: r["pct_rank"]
        for r in percent_rank_global(df, "v", 4).collect()
    }
    cd = {
        r["id"]: r["cume_dist"]
        for r in cume_dist_global(df, "v", 4).collect()
    }
    # bit-identical to the four separate operators, one pass instead
    # of four
    for i in fused:
        assert fused[i] == (rk[i], dr[i], pr[i], cd[i])


def test_global_ranks_skips_unrequested_columns(spark):
    from duckdb_imputation_spark.operators.prefix import global_ranks

    df = spark.range(50).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS v")
    out = global_ranks(
        df, "v", 3, dense_rank_col=None, percent_rank_col=None
    )
    assert set(out.columns) == {"id", "v", "rank", "cume_dist"}
    out.collect()


def test_global_ranks_single_row_and_lint(spark):
    from duckdb_imputation_spark.operators.prefix import global_ranks
    from duckdb_imputation_spark.plans import lint_plan

    one = spark.createDataFrame([(1, 5.0)], "id long, v double")
    r = global_ranks(one, "v", 3).collect()[0]
    assert (r["rank"], r["dense_rank"], r["pct_rank"], r["cume_dist"]) == (
        1, 1, 0.0, 1.0,
    )
    df = spark.range(400).selectExpr("id", "CAST(id % 13 AS DOUBLE) AS v")
    out = global_ranks(df, "v", 3)
    out.collect()
    errs = [f for f in lint_plan(out) if f.severity == "error"]
    assert not errs, errs
