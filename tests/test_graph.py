"""Unit tests for operators/graph.py — fixed-iteration weighted
PageRank against a pure-Python reference, including dangling nodes,
and the navigation-edge builder."""

import random

import pytest
from pyspark.sql import functions as F

from duckdb_imputation_spark.operators.graph import navigation_edges, pagerank


def _py_pagerank(edge_w, iters=3, damping=0.85):
    """edge_w: dict (src, dst) -> weight."""
    nodes = sorted({s for s, _ in edge_w} | {d for _, d in edge_w})
    out_w = {}
    for (s, _), w in edge_w.items():
        out_w[s] = out_w.get(s, 0.0) + w
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dm = sum(r[v] for v in nodes if v not in out_w)
        contrib = {v: 0.0 for v in nodes}
        for (s, d), w in edge_w.items():
            contrib[d] += r[s] * (w / out_w[s])
        r = {
            v: (1.0 - damping) / n + damping * (contrib[v] + dm / n)
            for v in nodes
        }
    return r


def _spark_ranks(spark, edge_w, **kw):
    rows = [(s, d, float(w)) for (s, d), w in edge_w.items()]
    e = spark.createDataFrame(rows, "src int, dst int, weight double")
    return {r["node"]: r["rank"] for r in pagerank(e, **kw).collect()}


def test_pagerank_matches_python_reference(spark):
    rng = random.Random(42)
    edge_w = {}
    for _ in range(60):
        s, d = rng.randrange(12), rng.randrange(12)
        if s != d:
            edge_w[(s, d)] = edge_w.get((s, d), 0) + 1
    got = _spark_ranks(spark, edge_w, iters=3)
    want = _py_pagerank(edge_w, iters=3)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v


def test_pagerank_with_dangling_nodes(spark):
    # node 3 has only in-edges: its mass must redistribute, not vanish
    edge_w = {(0, 1): 1, (1, 2): 1, (2, 3): 1, (0, 3): 2}
    got = _spark_ranks(spark, edge_w, iters=4)
    want = _py_pagerank(edge_w, iters=4)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_ranks_sum_to_one(spark):
    edge_w = {(i, (i + 1) % 7): 1 for i in range(7)}
    got = _spark_ranks(spark, edge_w, iters=5)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # symmetric cycle: every node identical
    vals = list(got.values())
    assert max(vals) - min(vals) < 1e-12


def test_pagerank_sink_attracts_mass(spark):
    # star into node 0 (which loops to 1): 0 must outrank the leaves
    edge_w = {(i, 0): 1 for i in range(1, 6)}
    edge_w[(0, 1)] = 1
    got = _spark_ranks(spark, edge_w, iters=3)
    assert got[0] > max(got[i] for i in range(2, 6))


def test_navigation_edges_counts_transitions(spark):
    rows = [
        (1, 1, 10), (1, 2, 20), (1, 3, 30),   # user 1: 10->20->30
        (2, 1, 10), (2, 2, 20),               # user 2: 10->20
        (3, 1, 99),                           # singleton: no edge
    ]
    ev = spark.createDataFrame(rows, "user_id int, t int, page int")
    e = {
        (r["src"], r["dst"]): r["weight"]
        for r in navigation_edges(ev, "user_id", "page", ["t"]).collect()
    }
    assert e == {(10, 20): 2.0, (20, 30): 1.0}


def test_pagerank_empty_edges(spark):
    e = spark.createDataFrame([], "src int, dst int, weight double")
    assert pagerank(e, iters=2).collect() == []


def _py_hits(edge_w, iters=5):
    nodes = sorted({s for s, _ in edge_w} | {d for _, d in edge_w})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(iters):
        auth = {v: 0.0 for v in nodes}
        for (s, d), w in edge_w.items():
            auth[d] += hub[s] * w
        t = sum(auth.values())
        auth = {v: a / t for v, a in auth.items()}
        hub = {v: 0.0 for v in nodes}
        for (s, d), w in edge_w.items():
            hub[s] += auth[d] * w
        t = sum(hub.values())
        hub = {v: h / t for v, h in hub.items()}
    return hub, auth


def test_hits_matches_python_reference(spark):
    from duckdb_imputation_spark.operators.graph import hits

    rng = random.Random(17)
    edge_w = {}
    for _ in range(40):
        s, d = rng.randrange(10), rng.randrange(10)
        if s != d:
            edge_w[(s, d)] = edge_w.get((s, d), 0) + 1
    rows = [(s, d, float(w)) for (s, d), w in edge_w.items()]
    e = spark.createDataFrame(rows, "src int, dst int, weight double")
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(e, iters=5).collect()
    }
    hub, auth = _py_hits(edge_w, iters=5)
    assert set(got) == set(hub)
    for v in hub:
        gh, ga = got[v]
        assert abs(gh - hub[v]) < 1e-10 and abs(ga - auth[v]) < 1e-10, v


def test_hits_hub_vs_authority_roles(spark):
    from duckdb_imputation_spark.operators.graph import hits

    # node 0 links to everything (pure hub); 1-4 are linked only (authorities)
    edge_w = {(0, i): 1 for i in range(1, 5)}
    rows = [(s, d, float(w)) for (s, d), w in edge_w.items()]
    e = spark.createDataFrame(rows, "src int, dst int, weight double")
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(e, iters=3).collect()}
    assert got[0][0] == 1.0          # all hub mass on node 0
    assert got[0][1] == 0.0          # no authority (nothing links to it)
    for i in range(1, 5):
        assert got[i][0] == 0.0 and abs(got[i][1] - 0.25) < 1e-12


# ------------------------------------------------------------------ #
# incremental_components                                               #
# ------------------------------------------------------------------ #

def test_incremental_components_merges_and_is_idempotent(spark):
    """Batch 2's bridge edge merges two existing components; the
    affected-node delta equals full CC over all edges restricted to the
    affected nodes, untouched components are absent from the delta, and
    replaying batch 2 against the merged state is a no-op mapping."""
    from duckdb_imputation_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    b1 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "src long, dst long"
    )
    state = incremental_components(None, b1)
    s1 = {r["node"]: r["component"] for r in state.collect()}
    assert s1 == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    # bridge 3-10 merges {1,2,3} with {10,11}; 20/21 untouched
    b2 = spark.createDataFrame([(3, 10), (30, 31)], "src long, dst long")
    state_df = spark.createDataFrame(
        [(k, v) for k, v in s1.items()], "node long, component long"
    )
    delta = incremental_components(state_df, b2)
    d = {r["node"]: r["component"] for r in delta.collect()}
    assert d == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 30: 30, 31: 30}
    assert 20 not in d and 21 not in d  # untouched component not rewritten

    # merged view equals full CC over all edges
    merged = {**s1, **d}
    full = {
        r["node"]: r["component"]
        for r in connected_components(b1.unionByName(b2)).collect()
    }
    assert merged == full

    # replay batch 2 against the merged state: identical mapping
    merged_df = spark.createDataFrame(
        [(k, v) for k, v in merged.items()], "node long, component long"
    )
    replay = {
        r["node"]: r["component"]
        for r in incremental_components(merged_df, b2).collect()
    }
    assert all(merged[k] == v for k, v in replay.items())


def test_streaming_components_sink_matches_batch_cc(spark, tmp_path):
    """Two availableNow runs (the second bridges run-1 components) end
    with state equal to batch CC over all edges; forced full redelivery
    on a fresh checkpoint converges to the same state."""
    from duckdb_imputation_spark.operators.graph import connected_components
    from duckdb_imputation_spark.streaming.sinks import (
        streaming_components_sink,
    )

    schema = "src long, dst long"
    rows1 = [(1, 2), (2, 3), (10, 11), (20, 21)]
    rows2 = [(3, 10), (30, 31), (11, 12)]
    src_dir = tmp_path / "cc_src"
    state = str(tmp_path / "cc_state")

    def run(ckpt):
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("maxFilesPerTrigger", 1).parquet(str(src_dir / "*"))
        q = (
            streaming_components_sink(
                stream, state, n_buckets=4,
                checkpoint=str(tmp_path / ckpt),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src_dir / "f1")
    )
    run("cp")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src_dir / "f2")
    )
    run("cp")

    def snap():
        return {
            r["node"]: r["component"]
            for r in spark.read.parquet(state).collect()
        }

    want = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(rows1 + rows2, schema)
        ).collect()
    }
    assert snap() == want
    run("cp_replay")  # full redelivery
    assert snap() == want


# --------------------------------------------------------------------- #
# triangle_counts                                                        #
# --------------------------------------------------------------------- #


def _py_triangles(pairs):
    """Brute-force per-node triangle counts over an undirected simple
    graph given as an iterable of (a, b) pairs (loops/dups/direction
    ignored)."""
    import itertools

    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {v: 0 for v in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return counts


def _spark_triangles(spark, pairs, **kw):
    from duckdb_imputation_spark.operators.graph import triangle_counts

    e = spark.createDataFrame(list(pairs), "src int, dst int")
    return {
        r["node"]: r["triangles"] for r in triangle_counts(e, **kw).collect()
    }


def test_triangles_random_graph_matches_bruteforce(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(15), rng.randrange(15)) for _ in range(80)]
    got = _spark_triangles(spark, pairs)
    want = _py_triangles(pairs)
    assert got == want
    assert sum(got.values()) % 3 == 0


def test_triangles_ignores_direction_dups_and_loops(spark):
    # K4 delivered messily: both directions, duplicates, self-loops.
    base = [(a, b) for a in range(4) for b in range(4) if a != b]
    pairs = base + base[:5] + [(0, 0), (2, 2)]
    got = _spark_triangles(spark, pairs)
    # every K4 vertex is in C(3,2) = 3 triangles
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_zero_rows_kept_and_droppable(spark):
    # a triangle plus a pendant path: 3-4 and 4-5 close nothing
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5)]
    got = _spark_triangles(spark, pairs)
    assert got == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0}
    only = _spark_triangles(spark, pairs, include_zero=False)
    assert only == {0: 1, 1: 1, 2: 1}


def test_triangles_hub_star_has_none(spark):
    # a star is triangle-free no matter the hub degree (the skew case
    # the degree orientation exists for)
    pairs = [(0, i) for i in range(1, 30)]
    got = _spark_triangles(spark, pairs)
    assert set(got.values()) == {0}


# --------------------------------------------------------------------- #
# personalized pagerank                                                  #
# --------------------------------------------------------------------- #


def _py_ppr(edge_w, tp, iters=3, damping=0.85):
    """tp: dict node -> weight (unnormalized, over graph nodes)."""
    nodes = sorted({s for s, _ in edge_w} | {d for _, d in edge_w})
    out_w = {}
    for (s, _), w in edge_w.items():
        out_w[s] = out_w.get(s, 0.0) + w
    tot = sum(tp.get(v, 0.0) for v in nodes)
    t = {v: tp.get(v, 0.0) / tot for v in nodes}
    r = dict(t)
    for _ in range(iters):
        dm = sum(r[v] for v in nodes if v not in out_w)
        contrib = {v: 0.0 for v in nodes}
        for (s, d), w in edge_w.items():
            contrib[d] += r[s] * (w / out_w[s])
        r = {
            v: (1.0 - damping) * t[v]
            + damping * (contrib[v] + dm * t[v])
            for v in nodes
        }
    return r


def test_personalized_pagerank_matches_python_reference(spark):
    rng = random.Random(23)
    edge_w = {}
    for _ in range(70):
        s, d = rng.randrange(14), rng.randrange(14)
        if s != d:
            edge_w[(s, d)] = edge_w.get((s, d), 0) + 1
    tp = {0: 2.0, 3: 1.0, 99: 5.0}  # 99 not in graph: dropped
    tpdf_rows = [(n, w) for n, w in tp.items()]
    e = spark.createDataFrame(
        [(s, d, float(w)) for (s, d), w in edge_w.items()],
        "src int, dst int, weight double",
    )
    tpdf = spark.createDataFrame(tpdf_rows, "node int, weight double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=3, teleport=tpdf).collect()
    }
    want = _py_ppr(edge_w, tp, iters=3)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
    # mass conservation and locality: seed nodes hold extra mass
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[0] > 1.0 / len(got)


def test_personalized_pagerank_zero_teleport_raises(spark):
    import pytest

    e = spark.createDataFrame([(0, 1, 1.0)], "src int, dst int, weight double")
    tpdf = spark.createDataFrame([(7, 1.0)], "node int, weight double")
    with pytest.raises(ValueError, match="teleport"):
        pagerank(e, teleport=tpdf)  # node 7 is not in the graph


def test_personalized_uniform_teleport_equals_plain(spark):
    rng = random.Random(31)
    edge_w = {}
    for _ in range(40):
        s, d = rng.randrange(10), rng.randrange(10)
        if s != d:
            edge_w[(s, d)] = edge_w.get((s, d), 0) + 1
    e = spark.createDataFrame(
        [(s, d, float(w)) for (s, d), w in edge_w.items()],
        "src int, dst int, weight double",
    )
    nodes = sorted({s for s, _ in edge_w} | {d for _, d in edge_w})
    tpdf = spark.createDataFrame(
        [(n, 1.0) for n in nodes], "node int, weight double"
    )
    plain = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    ppr = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=3, teleport=tpdf).collect()
    }
    for v in plain:
        assert abs(plain[v] - ppr[v]) < 1e-12


# ------------------------------------------------- label propagation

def _py_lpa(edge_list, max_iters):
    """Pure-Python synchronous LPA, min tie-break, undirected."""
    adj = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {n: n for n in adj}
    for _ in range(max_iters):
        new = {}
        for n in adj:
            cnt = {}
            for m in adj[n]:
                cnt[label[m]] = cnt.get(label[m], 0) + 1
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
        if new == label:
            break
        label = new
    return label


def test_label_propagation_matches_python_reference(spark):
    from duckdb_imputation_spark.operators.graph import label_propagation

    # two dense cliques + one bridge edge
    clique1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    clique2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    edges = clique1 + clique2 + [(4, 10)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, max_iters=5).collect()
    }
    ref = _py_lpa(edges, 5)
    assert got == ref
    # the two cliques must resolve to two distinct communities
    assert len({got[n] for n in range(5)}) == 1
    assert len({got[n] for n in range(10, 15)}) == 1
    assert got[0] != got[10]


def test_label_propagation_isolated_and_fixpoint(spark):
    from duckdb_imputation_spark.operators.graph import label_propagation

    # a single edge: both endpoints adopt the min label at round 1,
    # fixpoint detected (early stop) — stats reports the round count
    stats = {}
    df = spark.createDataFrame([(7, 3)], "src int, dst int")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, max_iters=10, stats=stats).collect()
    }
    # sync update: 7 adopts 3's label (3), 3 adopts 7's label (7) at
    # round 1; round 2 swaps again -> 2-cycle, runs to max_iters
    ref = _py_lpa([(7, 3)], 10)
    assert got == ref
    assert stats["rounds"] == 10  # the documented oscillation artifact


def test_label_propagation_triangle_converges(spark):
    from duckdb_imputation_spark.operators.graph import label_propagation

    stats = {}
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src int, dst int"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, max_iters=10, stats=stats).collect()
    }
    assert got == _py_lpa([(1, 2), (2, 3), (1, 3)], 10)
    assert stats["rounds"] < 10  # fixpoint reached, early stop
