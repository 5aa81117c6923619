"""Name-compat registry shims + physical-plan assertions (the plans we
designed for must actually materialize)."""

import pytest
from pyspark.sql import functions as F

from duckdb_imputation_spark.functions import registry as reg
from duckdb_imputation_spark.functions.triple import Triple
from duckdb_imputation_spark.mice import inject_nulls
from duckdb_imputation_spark.operators.cofactor import sum_to_triple
from duckdb_imputation_spark.plans import (
    count_hash_aggregates,
    has_broadcast_join,
    pushed_filters,
    read_schema,
)


def test_fused_shim_names_exist():
    for name in ["sum_to_triple_0_0", "sum_to_triple_3_3", "sum_to_triple_19_19",
                 "sum_to_nb_agg_2_1", "to_cofactor", "multiply_triple", "quack"]:
        assert hasattr(reg, name), name
    assert reg.quack("x") == "Quack x 🐥"


def test_fused_shim_matches_generic(ring_fixture):
    got = reg.sum_to_triple_3_3(ring_fixture, "a", "b", "c", "d", "e", "f").collect()
    exp = sum_to_triple(ring_fixture, ["a", "b", "c"], ["d", "e", "f"]).collect()
    assert Triple.from_row(got[0]["triple"]).to_dict() == Triple.from_row(
        exp[0]["triple"]
    ).to_dict()
    with pytest.raises(TypeError, match="expects 6"):
        reg.sum_to_triple_3_3(ring_fixture, "a", "b")


def test_inject_nulls_fraction(spark):
    df = spark.range(10_000).select(F.col("id"), F.lit(1.0).alias("x"))
    out = inject_nulls(df, ["x"], 0.2, seed=1)
    frac = out.filter("x IS NULL").count() / 10_000
    assert 0.15 < frac < 0.25


# ---------------------------------------------------------------- plans


def test_cofactor_scan_prunes_columns(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = sum_to_triple(li, ["l_quantity"], ["l_linenumber"])
    cols = set(read_schema(df))
    assert cols == {"l_quantity", "l_linenumber"}, cols


def test_dense_cofactor_partial_final_agg(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = sum_to_triple(li, ["l_quantity", "l_discount"], [], group_by=["l_returnflag"])
    assert count_hash_aggregates(df) == 2  # partial + final


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.filter(F.col("l_quantity") < 10).select("l_quantity")
    assert "LessThan(l_quantity" in pushed_filters(df)


def test_small_dim_join_broadcasts(spark):
    """Under the measured-sizes broadcast posture (session.py, r9) the
    STATIC plan for an unhinted dim join is sort-merge; AQE must
    PROMOTE it to broadcast from the dim side's actual shuffle size —
    so the assertion runs on the final adaptive plan, post-action."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    j = li.join(sup, li.l_suppkey == sup.s_suppkey).groupBy("s_nationkey").count()
    j.collect()
    assert has_broadcast_join(j)


def test_bucketed_join_no_shuffle(spark):
    """Two tables bucketed on the join key with equal bucket counts must
    sort-merge-join with ZERO shuffle exchanges — the write-side layout
    replaces the per-query re-shuffle (the 100 TB co-location path)."""
    from duckdb_imputation_spark.plans import count_exchanges
    from duckdb_imputation_spark.sources import write_bucketed_table

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed_table(li, "t_li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed_table(o, "t_o_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("t_li_b")
        b = spark.table("t_o_b")
        j = a.join(b, a.l_orderkey == b.o_orderkey).select("l_quantity", "o_totalprice")
        assert count_exchanges(j) == 0, j._jdf.queryExecution().executedPlan().toString()
        # sanity: the same join over the raw parquet DOES shuffle both sides
        raw = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_quantity", "o_totalprice"
        )
        assert count_exchanges(raw) >= 2
        assert j.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_o_b")


def test_compact_table(spark, tmp_path):
    from duckdb_imputation_spark.sources import compact_table

    p = str(tmp_path / "frag")
    spark.range(10_000).repartition(64).write.parquet(p)
    import os

    before = sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    assert before >= 32
    after = compact_table(spark, p, target_files=4)
    assert after == 4
    assert spark.read.parquet(p).count() == 10_000


def test_salted_join_matches_plain(spark):
    """Salting must not change join semantics: 90%-skewed key join equals
    the plain join row-for-row, for inner and left."""
    from duckdb_imputation_spark.operators.skew import salted_join

    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 100).alias("w"))
    for how in ("inner", "left"):
        plain = big.join(small, ["k"], how).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        salted = salted_join(big, small, ["k"], n_salts=4, how=how).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        a = {r["k"]: (r["n"], r["sv"]) for r in plain.collect()}
        b = {r["k"]: (r["n"], r["sv"]) for r in salted.collect()}
        assert a == b, how


def test_lsh_band_shuffle_is_slim(spark):
    """The banded exchange's input must carry ids and band hashes only —
    shingle payload through the band shuffle was the r1 scale defect
    (docs/PLANS_r2.md records the rewrite)."""
    from duckdb_imputation_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dd.minhash_lsh_pairs(docs, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.split("\n")
    found = False
    for i, line in enumerate(lines):
        if "hashpartitioning(__band" in line:
            found = True
            child = lines[i + 1] if i + 1 < len(lines) else ""
            assert "__sh" not in child, child
    assert found, plan


def test_csv_auto_reader(spark, tmp_path):
    from duckdb_imputation_spark.sources import read_csv_auto, write_table

    p = str(tmp_path / "iris.csv")
    with open(p, "w") as f:
        f.write("sepal_len,petal_len,species\n5.1,1.4,0\n4.9,1.5,1\n")
    df = read_csv_auto(spark, p)
    assert df.columns == ["sepal_len", "petal_len", "species"]
    assert dict(df.dtypes)["sepal_len"] == "double"
    assert df.count() == 2

    out = str(tmp_path / "sink")
    write_table(df, out, partition_by=["species"])
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert {r["species"] for r in back.collect()} == {0, 1}


def test_salted_join_salt_is_deterministic_and_spreads(spark):
    """The salt is a pure function of row content: repartitioning must
    not change any row's salt (rand(seed) fails this), and a hot key's
    rows must still spread over multiple salts."""
    from pyspark.sql import functions as F

    big = spark.range(2_000).select(
        F.lit(1).alias("k"), F.col("id").alias("v")
    )
    salt = F.pmod(F.hash(F.col("k"), F.col("v"), F.lit(42)), F.lit(4))
    a = {r["v"]: r["s"] for r in big.withColumn("s", salt).collect()}
    b = {
        r["v"]: r["s"]
        for r in big.repartition(13, "v").withColumn("s", salt).collect()
    }
    assert a == b  # repartition-stable
    assert len(set(a.values())) == 4  # hot key spreads over all salts


def test_decontaminate_rejects_non_integral_ids(spark):
    from duckdb_imputation_spark.operators import dedup as dd

    t = spark.createDataFrame([("x", "some text here")], "doc_id string, text string")
    with pytest.raises(TypeError, match="integral id"):
        dd.minhash_decontaminate(t, t, "text", "doc_id")


def test_decontaminate_huge_ids_roundtrip(spark):
    """Ids above 2^53 must survive the uid encode/decode exactly (float
    division would corrupt them)."""
    from duckdb_imputation_spark.operators import dedup as dd

    base = 2**53 + 12345
    txt = "the quick brown fox jumps over the lazy dog " * 3
    train = spark.createDataFrame(
        [(base, txt), (base + 1, "completely different words entirely " * 3)],
        "doc_id long, text string",
    )
    contam = spark.createDataFrame([(7, txt)], "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in dd.minhash_decontaminate(train, contam, "text", "doc_id").collect()
    )
    assert kept == [base + 1]  # exact id dropped, neighbor kept bit-exactly


def test_compact_table_recovers_from_interrupted_swap(spark, tmp_path):
    """Crash between the two renames leaves only the backup dir; the next
    call must restore it and complete the compaction."""
    import os

    from duckdb_imputation_spark.sources import compact_table

    p = str(tmp_path / "tbl")
    spark.range(1_000).repartition(16).write.parquet(p)
    os.rename(p, p + "__compact_backup")  # simulate the crash window
    after = compact_table(spark, p, target_files=2)
    assert after == 2
    assert spark.read.parquet(p).count() == 1_000
    assert not os.path.exists(p + "__compact_backup")


def test_dedup_components_long_chain_converges(spark):
    """A 10-hop duplicate chain needs 10 propagation rounds; the
    every-2nd-round convergence check must still produce the exact
    min-label closure."""
    from duckdb_imputation_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    got = {r["id"]: r["canonical"] for r in dedup_components(pairs).collect()}
    assert got == {i: 0 for i in range(11)}


def test_upsert_table(spark, tmp_path):
    from duckdb_imputation_spark.sources import upsert_table

    p = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, payload string"
    ).write.parquet(p)
    updates = spark.createDataFrame(
        [(3, "NEW3"), (7, "NEW7"), (100, "NEW100")], "id long, payload string"
    )
    n = upsert_table(spark, p, updates, "id")
    assert n == 11  # 10 originals - 2 replaced + 3 upserts
    got = {r.id: r.payload for r in spark.read.parquet(p).collect()}
    assert got[3] == "NEW3" and got[7] == "NEW7" and got[100] == "NEW100"
    assert got[0] == "v0" and len(got) == 11
    # idempotent re-apply
    assert upsert_table(spark, p, updates, "id") == 11


def test_upsert_table_recovers_from_interrupted_swap(spark, tmp_path):
    import os

    from duckdb_imputation_spark.sources import upsert_table

    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    # simulate a crash between the two renames: only the backup exists
    os.rename(p, p + "__upsert_backup")
    updates = spark.createDataFrame([(2, "b")], "id long, v string")
    assert upsert_table(spark, p, updates, "id") == 2
    assert {r.id for r in spark.read.parquet(p).collect()} == {1, 2}


def test_upsert_table_partitioned_touches_only_affected_partitions(spark, tmp_path):
    import os

    from duckdb_imputation_spark.sources import upsert_table_partitioned, write_table

    p = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(40)], "id long, shard int, payload string"
    )
    write_table(df, p, partition_by=["shard"])
    untouched = {}
    for shard in (2, 3):
        d = f"{p}/shard={shard}"
        untouched[shard] = {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    updates = spark.createDataFrame(
        [(0, 0, "NEW0"), (5, 1, "NEW5"), (100, 0, "NEW100")],
        "id long, shard int, payload string",
    )
    n = upsert_table_partitioned(spark, p, updates, "id", "shard")
    assert n == 21  # shards 0+1 hold 20 rows, -2 replaced +3 new

    got = {r.id: r.payload for r in spark.read.parquet(p).collect()}
    assert len(got) == 41
    assert got[0] == "NEW0" and got[5] == "NEW5" and got[100] == "NEW100"
    assert got[2] == "v2"  # untouched shard-2 row intact
    # physical check: shard=2/3 files never rewritten
    for shard, files in untouched.items():
        d = f"{p}/shard={shard}"
        now = {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }
        assert now == files


def test_upsert_table_partitioned_empty_updates(spark, tmp_path):
    from duckdb_imputation_spark.sources import upsert_table_partitioned, write_table

    p = str(tmp_path / "pt2")
    df = spark.createDataFrame([(1, 0, "a")], "id long, shard int, payload string")
    write_table(df, p, partition_by=["shard"])
    empty = df.filter("id < 0")
    assert upsert_table_partitioned(spark, p, empty, "id", "shard") == 0
    assert spark.read.parquet(p).count() == 1


@pytest.mark.parametrize("fmt", ["orc", "json"])
def test_write_table_format_round_trip(spark, tmp_path, fmt):
    """The generic sink handles Spark's other native formats (reference
    scan surface is CSV/parquet; ORC/JSON ride the same writer)."""
    from duckdb_imputation_spark.sources import write_table

    df = spark.createDataFrame(
        [(i, f"v{i}", float(i) / 4) for i in range(50)],
        "id long, name string, x double",
    )
    p = str(tmp_path / f"t_{fmt}")
    write_table(df, p, fmt=fmt)
    back = spark.read.format(fmt).load(p)
    if fmt == "json":  # json loses column order/types; realign
        back = back.select("id", "name", F.col("x").cast("double"))
    assert back.count() == 50
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_strip_cached_subtrees_removes_reprinted_build_plans(spark):
    """A persisted frame probed k times re-prints its build plan k
    times in the executedPlan string; the stripper keeps the live tree
    (and the InMemoryRelation node line) but drops the cached child
    plans, so exchange counts reflect what actually executes."""
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.plans import (
        executed_plan,
        plan_shape,
        strip_cached_subtrees,
    )

    base = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))  # 1 exchange in the build
        .persist()
    )
    base.count()  # materialize the cache
    probes = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source")
    out = probes
    for i in range(3):
        out = out.join(
            F.broadcast(base.withColumnRenamed("n", f"n{i}")), "source"
        )
    out.collect()
    raw = executed_plan(out)
    stripped = strip_cached_subtrees(raw)
    raw_x = raw.count("Exchange hashpartitioning")
    live_x = stripped.count("Exchange hashpartitioning")
    # the build exchange appears once per probe in the raw string but
    # zero times in the live tree (the probes read the cache)
    assert raw_x >= 3
    assert live_x == 0
    assert "InMemoryRelation" in stripped  # node line survives
    assert plan_shape(out)["exchanges"] == 0
    base.unpersist()
