"""Bloom filter family (operators/sketches.py) and connected components
(operators/graph.py).

Properties under test are the 100 TB load-bearing ones: Bloom has NO
false negatives, merge is exact AND idempotent (bitwise OR — the
crash-replay property), membership answers replay from a pure-Python
md5 twin bit-for-bit, and min-label components equal a union-find
reference on random graphs."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from duckdb_imputation_spark.operators.graph import connected_components
from duckdb_imputation_spark.operators.sketches import (
    bloom_build,
    bloom_contains,
    merge_bloom,
)


def _py_bf_bucket(val: str, i: int, m: int) -> int:
    return int(hashlib.md5(f"bf{i}|{val}".encode()).hexdigest()[:8], 16) % m


def _py_bloom(values, m, k):
    bits = set()
    for v in values:
        for i in range(k):
            bits.add(_py_bf_bucket(v, i, m))
    return bits


def _py_contains(bits, val, m, k):
    return all(_py_bf_bucket(val, i, m) in bits for i in range(k))


def test_bloom_no_false_negatives(spark):
    vals = [f"tok{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    bf = bloom_build(df, "v", m_bits=4096, k_hashes=3)
    got = {
        r["v"]: r["maybe_present"]
        for r in bloom_contains(bf, df, "v", m_bits=4096, k_hashes=3).collect()
    }
    assert all(got[v] for v in vals)


def test_bloom_matches_python_reference(spark):
    m, k = 512, 3  # tiny on purpose: collisions must match too
    ins = [f"in{i}" for i in range(60)]
    probes = ins[:10] + [f"out{i}" for i in range(80)]
    bf = bloom_build(
        spark.createDataFrame([(v,) for v in ins], "v string"),
        "v", m_bits=m, k_hashes=k,
    )
    got = {
        r["v"]: r["maybe_present"]
        for r in bloom_contains(
            bf,
            spark.createDataFrame([(v,) for v in probes], "v string"),
            "v", m_bits=m, k_hashes=k,
        ).collect()
    }
    bits = _py_bloom(ins, m, k)
    exp = {v: _py_contains(bits, v, m, k) for v in probes}
    assert got == exp
    # the tiny filter must actually exhibit a false positive, or the
    # reference comparison proves nothing
    assert any(exp[v] for v in probes if v.startswith("out"))


def test_bloom_merge_equals_single_pass_and_is_idempotent(spark):
    vals = [f"v{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    a = bloom_build(df.where("v < 'v2'"), "v", m_bits=2048, k_hashes=4)
    b = bloom_build(df.where("v >= 'v2'"), "v", m_bits=2048, k_hashes=4)
    merged = {r["word"]: r["bits"] for r in merge_bloom(a, b).collect()}
    single = {
        r["word"]: r["bits"]
        for r in bloom_build(df, "v", m_bits=2048, k_hashes=4).collect()
    }
    assert merged == single
    # idempotent: OR with itself changes nothing (the replay property)
    again = {
        r["word"]: r["bits"]
        for r in merge_bloom(a, a, b, b).collect()
    }
    assert again == single


def test_bloom_definitely_absent_is_certain(spark):
    # big filter, few values: no collisions -> every absent probe False
    ins = spark.createDataFrame([(f"x{i}",) for i in range(20)], "v string")
    bf = bloom_build(ins, "v", m_bits=1 << 20, k_hashes=3)
    outs = spark.createDataFrame([(f"y{i}",) for i in range(50)], "v string")
    got = bloom_contains(bf, outs, "v", m_bits=1 << 20, k_hashes=3)
    assert all(not r["maybe_present"] for r in got.collect())


def test_bloom_state_bounded(spark):
    df = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    bf = bloom_build(df, "v", m_bits=1024, k_hashes=3)
    assert bf.count() <= 1024 // 64


# --------------------------------------------------------------------- #
# connected components                                                  #
# --------------------------------------------------------------------- #


def _py_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_components_two_islands_and_chain(spark):
    edges = [(1, 2), (2, 3), (10, 11), (12, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_components_direction_ignored_by_default(spark):
    # edge only dst->src direction: undirected semantics must join them
    df = spark.createDataFrame([(5, 1), (9, 5)], "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert set(got.values()) == {1}


def test_components_match_union_find_randomized(spark):
    rng = random.Random(23)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    touched = sorted({n for e in edges for n in e})
    exp = _py_components(edges, touched)
    # isolated nodes (self-edges only in expectation) — compare on the
    # touched set, which is exactly what the operator sees
    assert got == {n: exp[n] for n in touched}


def test_components_null_ids_dropped(spark):
    df = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    # NULL endpoints are filtered; 3 and 4 never acquire an edge
    assert got == {1: 1, 2: 1}


def test_bloom_decontaminate_equals_exact_path(spark):
    """The two-phase Bloom plan must return EXACTLY what the exact
    broadcast path returns (no false negatives in phase 1, phase 2
    kills the false positives) — on a corpus where some documents share
    a 13-gram with the contamination set and some do not."""
    from duckdb_imputation_spark.operators.dedup import (
        bloom_decontaminate,
        ngram_decontaminate,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # contamination: verbatim copies of five documents plus noise rows
    contam = d.where("doc_id % 10 = 0").select("text").unionByName(
        spark.createDataFrame(
            [("completely unrelated benchmark question about nothing",)],
            "text string",
        )
    )
    exact = {
        r["doc_id"]
        for r in ngram_decontaminate(d, contam, "text", "doc_id").collect()
    }
    via_bloom = {
        r["doc_id"]
        for r in bloom_decontaminate(
            d, contam, "text", "doc_id", m_bits=1 << 14, k_hashes=4
        ).collect()
    }
    assert via_bloom == exact
    # and contamination actually removed something, or the test is vacuous
    assert len(exact) < d.count()


def test_bloom_decontaminate_equal_even_with_heavy_fp_rate(spark):
    """A deliberately tiny filter (high FP rate) must not change the
    RESULT — only the phase-2 shuffle size.  This is the property that
    makes the m_bits knob a pure performance dial."""
    from duckdb_imputation_spark.operators.dedup import (
        bloom_decontaminate,
        ngram_decontaminate,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    contam = d.where("doc_id % 7 = 0").select("text")
    exact = {
        r["doc_id"]
        for r in ngram_decontaminate(d, contam, "text", "doc_id").collect()
    }
    tiny = {
        r["doc_id"]
        for r in bloom_decontaminate(
            d, contam, "text", "doc_id", m_bits=256, k_hashes=2
        ).collect()
    }
    assert tiny == exact


def test_bloom_decontaminate_autosized_default_never_saturates(spark):
    """m_bits=None (the new default, VERDICT r7 #4) sizes the filter
    from the taint-gram cardinality: the same contamination set that
    saturates a fixed 256-bit filter gets a right-sized one with no
    saturation warning, and the result still equals the exact path."""
    import warnings

    from duckdb_imputation_spark.operators.dedup import (
        bloom_decontaminate,
        ngram_decontaminate,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    contam = d.where("doc_id % 7 = 0").select("text")
    exact = {
        r["doc_id"]
        for r in ngram_decontaminate(d, contam, "text", "doc_id").collect()
    }
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        auto = {
            r["doc_id"]
            for r in bloom_decontaminate(d, contam, "text", "doc_id").collect()
        }
    assert auto == exact


def test_bloom_decontaminate_saturated_filter_warns(spark):
    """An explicitly undersized filter (the r7 rehearsal's silent
    99%-FP degradation) is now VISIBLE: >75% bits set raises a
    UserWarning naming the fill ratio and the auto-size fix (an
    optimally sized filter sits at ~50% fill by design, so 75% cleanly
    separates designed from undersized)."""
    import pytest as _pytest

    from duckdb_imputation_spark.operators.dedup import bloom_decontaminate

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    contam = d.where("doc_id % 7 = 0").select("text")
    with _pytest.warns(UserWarning, match="full"):
        bloom_decontaminate(
            d, contam, "text", "doc_id", m_bits=256, k_hashes=2
        ).collect()


def test_bloom_inline_probe_matches_grouped_probe(spark):
    from duckdb_imputation_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
        bloom_contains_inline,
    )

    vals = [f"v{i}" for i in range(150)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    bf = bloom_build(df.where("v < 'v5'"), "v", m_bits=512, k_hashes=3)
    grouped = {
        r["v"]: r["maybe_present"]
        for r in bloom_contains(bf, df, "v", m_bits=512, k_hashes=3).collect()
    }
    inline = {
        r["v"]: r["maybe_present"]
        for r in bloom_contains_inline(
            df, bf, "v", m_bits=512, k_hashes=3
        ).collect()
    }
    assert inline == grouped


def test_bloom_inline_probe_is_shuffle_free(spark):
    """The inline probe must add ZERO exchanges on the probed stream —
    k broadcast joins only (the property that makes it usable as a
    corpus-scale pre-filter)."""
    from duckdb_imputation_spark.operators.sketches import (
        bloom_build,
        bloom_contains_inline,
    )
    from duckdb_imputation_spark.plans import executed_plan

    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(F.md5("text").alias("fp"))
    bf = bloom_build(df.limit(100), "fp", m_bits=2048, k_hashes=3)
    probed = bloom_contains_inline(df, bf, "fp", m_bits=2048, k_hashes=3)
    probed.collect()
    p = executed_plan(probed)
    assert p.count("BroadcastHashJoin") >= 3
    # the filter build aggregates (its own exchanges are fine); the
    # PROBE side must not exchange: no hashpartitioning on fp
    assert "hashpartitioning(fp" not in p


def test_bloom_probe_rejects_grouped_filter(spark):
    from duckdb_imputation_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
        bloom_contains_inline,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "day string, v string"
    )
    bf = bloom_build(df, "v", m_bits=256, k_hashes=2, by_cols=["day"])
    probes = df.select("v")
    with pytest.raises(ValueError, match="group columns"):
        bloom_contains(bf, probes, "v", m_bits=256, k_hashes=2)
    with pytest.raises(ValueError, match="group columns"):
        bloom_contains_inline(probes, bf, "v", m_bits=256, k_hashes=2)


def test_alternating_components_match_min_label(spark):
    from duckdb_imputation_spark.operators.graph import (
        connected_components,
        connected_components_alternating,
    )

    rng = random.Random(41)
    nodes = list(range(50))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    b = {
        r["node"]: r["component"]
        for r in connected_components_alternating(df).collect()
    }
    assert a == b


def test_alternating_components_long_chain_converges_fast(spark):
    """A 120-node chain has diameter 119: min-label propagation needs
    ~119 rounds, the alternating-star algorithm O(log^2).  max_iters=12
    makes the test itself the convergence proof — a slow algorithm
    cannot produce the correct single component within the bound."""
    from duckdb_imputation_spark.operators.graph import (
        connected_components_alternating,
    )

    n = 120
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_alternating(
            df, max_iters=12
        ).collect()
    }
    assert len(got) == n
    assert set(got.values()) == {0}


def test_components_have_no_checkpoint_cadence_knob():
    """VERDICT r6 #4: checkpoint_every was a dead parameter on both
    components functions.  Resolution: DROPPED, not wired — the
    per-round convergence probes materialize the new frame anyway, so
    the per-round lineage cut is free, and honoring a >1 cadence
    makes every probe recompute the un-checkpointed prefix
    (measured: the 120-node-chain test blows past its runtime at
    cadence 3).  This test pins the signature so the parameter does
    not quietly come back half-wired."""
    import inspect

    from duckdb_imputation_spark.operators.graph import (
        connected_components,
        connected_components_alternating,
    )

    for fn in (connected_components, connected_components_alternating):
        assert "checkpoint_every" not in inspect.signature(fn).parameters


def test_alternating_components_self_loop_singleton(spark):
    from duckdb_imputation_spark.operators.graph import (
        connected_components,
        connected_components_alternating,
    )

    df = spark.createDataFrame(
        [(7, 7), (1, 2)], "src long, dst long"
    )
    a = {r["node"]: r["component"] for r in connected_components(df).collect()}
    b = {
        r["node"]: r["component"]
        for r in connected_components_alternating(df).collect()
    }
    assert a == b == {7: 7, 1: 1, 2: 1}


def test_bloom_size_for_hits_target_fp(spark):
    """bloom_size_for's (m, k) must deliver roughly the requested FP
    rate when actually built and probed (empirical check on 2000
    inserted / 2000 disjoint probe values), and reject bad inputs."""
    from duckdb_imputation_spark.operators.sketches import (
        bloom_build,
        bloom_contains_inline,
        bloom_size_for,
    )
    from pyspark.sql import functions as F

    n = 2000
    m_bits, k = bloom_size_for(n, 0.02)
    assert m_bits % 64 == 0
    ins = spark.range(n).select(F.concat(F.lit("in"), "id").alias("v"))
    probes = spark.range(n).select(F.concat(F.lit("out"), "id").alias("v"))
    bf = bloom_build(ins, "v", m_bits=m_bits, k_hashes=k)
    fp = (
        bloom_contains_inline(probes, bf, "v", m_bits=m_bits, k_hashes=k)
        .where("maybe_present")
        .count()
    )
    # target 2%: accept up to 3x (hash variance on one draw)
    assert fp / n < 0.06

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bloom_size_for(0)
    with _pytest.raises(ValueError):
        bloom_size_for(10, 1.5)


def test_components_stats_report_rounds(spark):
    from duckdb_imputation_spark.operators.graph import (
        connected_components,
        connected_components_alternating,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    s1: dict = {}
    s2: dict = {}
    connected_components(df, stats=s1).collect()
    connected_components_alternating(df, stats=s2).collect()
    # 4-node chain: min-label needs diameter-ish rounds (3 label
    # rounds + the zero-change confirm), alternating O(log) rounds
    assert s1["rounds"] >= 3
    assert 1 <= s2["rounds"] <= 5
