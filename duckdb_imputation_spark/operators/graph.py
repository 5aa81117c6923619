"""Link-graph analytics — PageRank as a corpus quality signal.

Web-scale corpus curation weighs documents by the importance of the
pages they came from (the Common Crawl practice since the original
PageRank paper: Page, Brin, Motwani & Winograd, "The PageRank Citation
Ranking", 1999).  This module runs fixed-iteration weighted PageRank on
an edge DataFrame — here derived from user navigation transitions, in
production from a hyperlink table.

Scale shape: ranks and the normalized edge list are the only state.
Each iteration is ONE equi-join (ranks ⋈ edges on src, broadcast-able
when ranks fit, shuffle-partitioned otherwise) and ONE keyed aggregate
on dst; the dangling-node mass is a scalar aggregate collected to the
driver per iteration (a designed stats boundary, like the k-means
round in simsearch).  Lineage is cut with ``localCheckpoint`` every
``checkpoint_every`` iterations so the plan stays bounded for long
runs.

Determinism: given a fixed edge multiset, every iteration is a pure
deterministic computation (sums of doubles; partitioning only affects
addition order, which the catalog row's ``round(,6)`` output absorbs —
the same argument as the LM-score rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "navigation_edges",
    "hits",
    "connected_components",
    "connected_components_alternating",
    "incremental_components",
    "triangle_counts",
    "label_propagation",
]


def navigation_edges(
    events: DataFrame,
    user_col: str,
    page_col: str,
    order_cols,
) -> DataFrame:
    """Per-user navigation transitions: consecutive events of the same
    user (ordered by ``order_cols``) become a (src, dst) edge with a
    transition count as weight.  The window is partitioned per user —
    never global."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(*order_cols)
    trans = events.select(
        F.col(page_col).alias("src"),
        F.lead(page_col).over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    return trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = "weight",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 1,
    teleport: DataFrame | None = None,
    teleport_col: str = "weight",
) -> DataFrame:
    """Weighted PageRank with uniform teleport and uniform dangling-mass
    redistribution, run for exactly ``iters`` power iterations from the
    uniform start — the textbook update:

        r'(v) = (1-d)/n + d * ( Σ_{u→v} r(u)·w(u,v)/out_w(u) + dm/n )

    where ``dm`` is the total rank mass sitting on dangling nodes (no
    out-edges).  Returns (node, rank); ranks sum to 1 after every
    iteration by construction.

    ``teleport``: a (node, ``teleport_col``) frame switches to
    PERSONALIZED PageRank (Haveliwala, "Topic-Sensitive PageRank",
    WWW 2002): teleport AND dangling mass land on the teleport
    distribution instead of uniformly —

        r'(v) = (1-d)·t(v) + d * ( Σ_{u→v} r(u)·w(u,v)/out_w(u) + dm·t(v) )

    with t normalized to sum 1 over the graph's nodes (teleport rows
    for nodes outside the graph are dropped; graph nodes absent from
    ``teleport`` get t=0 and are reachable only through links — the
    locality that makes PPR a similarity-to-seed-set score).  The
    iteration starts from r0 = t.  Scale shape is unchanged: t rides
    as one extra column on the node-sized frame, joined ONCE before
    the loop.  Raises if the teleport weights sum to <= 0 over the
    graph's nodes.

    Fixed iterations (not convergence-tested) keep the computation
    exactly reproducible — the catalog row's DuckDB oracle unrolls the
    same three iterations as CTEs.

    NULL node ids: filter them out beforehand — equi-join semantics
    make a NULL node's edges inert (it receives only teleport mass and
    contributes nothing), identically in Spark and any SQL twin.

    ``checkpoint_every=1`` (default): since r13 the dangling mass is an
    in-plan 1-row aggregate broadcast into the rank update (no driver
    collect — the whole loop is ONE action), but each iteration still
    references the previous ranks TWICE (the dangling-mass aggregate
    and the contribution join), so an un-checkpointed lineage doubles
    per iteration — O(2^iters) plan growth.  The lazy per-iteration
    checkpoint cuts that lineage; it only materializes the node-sized
    rank frame (ADVICE r13: this paragraph used to cite the collect,
    which is gone)."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    # ONE pass over the raw edge build: everything downstream (norm,
    # nodes, src set) derives from this checkpointed edge-sized frame,
    # so an expensive upstream (a navigation window over the corpus)
    # runs exactly once
    e = (
        edges.groupBy(src, dst)
        .agg(F.sum(w).alias("__w"))
        .localCheckpoint(eager=False)
    )
    out_w = e.groupBy(src).agg(F.sum("__w").alias("__ow"))
    norm = (
        e.join(out_w, src)
        .select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            (F.col("__w") / F.col("__ow")).alias("__p"),
        )
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # derive from the CHECKPOINTED norm frame, not out_w: the dangling
    # collect joins against this every iteration, and out_w's lineage
    # reaches back through the raw edge build (at 10x data that re-ran
    # the upstream window 3x — measured before this line changed)
    src_nodes = norm.select(F.col("__src").alias("node")).distinct()

    if teleport is not None:
        tp0 = teleport.select(
            F.col("node"),
            F.col(teleport_col).cast("double").alias("__tw"),
        ).groupBy("node").agg(F.sum("__tw").alias("__tw"))
        tp_on_graph = nodes.join(tp0, "node", "inner")
        total = tp_on_graph.agg(F.sum("__tw")).collect()[0][0]
        if total is None or total <= 0.0:
            raise ValueError(
                "pagerank: teleport weights must sum to > 0 over the "
                "graph's nodes"
            )
        base = (
            nodes.join(tp_on_graph.select("node", "__tw"), "node", "left")
            .select(
                "node",
                (
                    F.coalesce("__tw", F.lit(0.0)) / F.lit(float(total))
                ).alias("__tp"),
            )
            .localCheckpoint(eager=False)
        )
        ranks = base.select("node", F.col("__tp").alias("rank"), "__tp")
        for i in range(iters):
            # dangling mass as an IN-PLAN 1-row aggregate broadcast into
            # the update (guide §2.4/§5: same value the old per-iteration
            # collect produced — identical aggregate, identical
            # arithmetic — without a driver round trip per iteration, so
            # the whole loop executes as ONE action; the lazy
            # per-iteration checkpoints still bound lineage and are
            # materialized once inside that action)
            dm_df = (
                ranks.join(src_nodes, "node", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
            )
            contrib = (
                ranks.join(norm, ranks["node"] == norm["__src"])
                .groupBy("__dst")
                .agg(F.sum(F.col("rank") * F.col("__p")).alias("__c"))
                .withColumnRenamed("__dst", "node")
            )
            ranks = (
                base.join(contrib, "node", "left")
                .join(F.broadcast(dm_df), F.lit(True), "inner")
                .select(
                    "node",
                    (
                        F.lit(1.0 - damping) * F.col("__tp")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("__c"), F.lit(0.0))
                            + F.col("__dm") * F.col("__tp")
                        )
                    ).alias("rank"),
                    "__tp",
                )
            )
            if (i + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint(eager=False)
        return ranks.select("node", "rank")

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iters):
        # in-plan dangling mass — see the teleport branch above.  The
        # old code divided the collected scalar by n on the driver
        # (dm / n); dividing the column by the same float literal is the
        # identical double operation.
        dm_df = (
            ranks.join(src_nodes, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        contrib = (
            ranks.join(norm, ranks["node"] == norm["__src"])
            .groupBy("__dst")
            .agg(F.sum(F.col("rank") * F.col("__p")).alias("__c"))
            .withColumnRenamed("__dst", "node")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(dm_df), F.lit(True), "inner")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = "weight",
    iters: int = 5,
    checkpoint_every: int = 1,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999), fixed power iterations
    with sum (L1) normalization each half-step so scores stay exactly
    reproducible:

        auth'(v) = Σ_{u→v} w(u,v)·hub(u)     then auth /= Σ auth
        hub'(u)  = Σ_{u→v} w(u,v)·auth'(v)   then hub  /= Σ hub

    Returns (node, hub, authority).  A good HUB links to many good
    authorities (a curated index page); a good AUTHORITY is linked by
    many good hubs (a canonical source) — the complementary
    source-quality signal to :func:`pagerank`.

    Same scale shape as pagerank: per half-step ONE equi-join + ONE
    keyed aggregate; the normalizer is a 1-row scalar-aggregate
    broadcast (kept in-plan — no driver collect in the loop).  The
    default ``checkpoint_every=1`` cuts lineage each iteration: an
    iteration stacks 4 joins + 2 scalar aggregates, so an uncut chain
    multiplies PLANNING cost fast, while the checkpoint itself only
    materializes the node-sized state — the cheap side at any scale."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.groupBy(src, dst).agg(F.sum(w).alias("__w")).localCheckpoint(
        eager=False
    )
    # nodes derive from the checkpointed e — the raw edge build runs once
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    state = nodes.select("node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))

    def _norm(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.sum(col).alias("__tot"))
        return df.crossJoin(F.broadcast(tot)).select(
            *[c for c in df.columns if c != col],
            (F.col(col) / F.col("__tot")).alias(col),
        )

    for i in range(iters):
        auth = (
            state.join(e, state["node"] == e[src])
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("hub") * F.col("__w")).alias("auth"))
        )
        auth = _norm(
            nodes.join(auth, "node", "left").select(
                "node", F.coalesce("auth", F.lit(0.0)).alias("auth")
            ),
            "auth",
        )
        hub = (
            auth.join(e, auth["node"] == e[dst])
            .groupBy(F.col(src).alias("node"))
            .agg(F.sum(F.col("auth") * F.col("__w")).alias("hub"))
        )
        hub = _norm(
            nodes.join(hub, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        state = nodes.join(hub, "node").join(auth, "node")
        if (i + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=False)
    return state.select("node", "hub", F.col("auth").alias("authority"))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    max_iters: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by min-label propagation: every node starts
    as its own component id; each round a node's label becomes the min
    of its own and its neighbours' labels; fixpoint = every node
    carries the smallest node id of its component.  Returns
    (node, component).

    ``directed=False`` (default) symmetrizes the edge list first, so
    the result is UNDIRECTED components (for strongly-connected
    components use a dedicated algorithm — min propagation over a
    directed graph computes reachability-min, not SCCs).

    Scale shape: state is node-sized; each round is ONE equi-join
    (state ⋈ edges on src) + ONE keyed min-aggregate — the same cost
    profile as a pagerank iteration — plus a scalar convergence probe
    (changed-label count, a designed driver boundary like the dangling
    collect).  Lineage is cut with ``localCheckpoint`` EVERY round, by
    design and not configurably (unlike pagerank/hits' cadence knob):
    the convergence probe materializes the new state each round
    anyway, so the cut is free — and skipping it would make every
    probe recompute the whole un-checkpointed prefix, turning the loop
    O(rounds²).  Rounds needed = graph DIAMETER: fine
    for social/web/co-occurrence graphs (small diameter), pathological
    for long chains — for those use
    :func:`connected_components_alternating` (identical output,
    O(log²) rounds); ``max_iters`` bounds the loop either way
    (converged-early is detected exactly: zero labels changed).

    ``stats``: pass a dict to receive ``{"rounds": n}`` — the number
    of propagation rounds executed (scale-rehearsal instrumentation;
    no effect on the result)."""
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("__s"), F.col(src).alias("__d"))
        )
    e = e.where(
        F.col("__s").isNotNull() & F.col("__d").isNotNull()
    ).distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    state = nodes.select("node", F.col("node").alias("component"))
    for i in range(max_iters):
        cand = (
            state.join(e, state["node"] == e["__s"])
            .select(F.col("__d").alias("node"), "component")
        )
        new_state = (
            state.unionByName(cand)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_state.join(
                state.withColumnRenamed("component", "__old"), "node"
            )
            .where(F.col("component") != F.col("__old"))
            .count()
        )
        state = new_state
        if stats is not None:
            stats["rounds"] = i + 1
        if changed == 0:
            break
    return state


def connected_components_alternating(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected
    Components in MapReduce and Beyond", SoCC 2014) — the published
    O(log²)-round algorithm for graphs whose DIAMETER makes plain
    min-label propagation (:func:`connected_components`) pathological
    (long chains, lattice-like link graphs).  Undirected semantics;
    returns (node, component) with component = min node id, identical
    output to :func:`connected_components`.

    Per round, over the current edge set E (kept as canonical u>v
    pairs):

    * **large-star**: every node u links each STRICTLY LARGER
      neighbour to m(u) = min(N(u) ∪ {u}) — large neighbourhoods hang
      off their local minimum;
    * **small-star**: every node u links each neighbour ≤ u (and
      itself) to m(u) — chains fold onto the minimum.

    Both steps are ONE groupBy over the edge list + an edge-sized
    re-emit (map-side combinable min), so a round costs two keyed
    shuffles of edge-sized data; the edge set never grows beyond the
    input's star-closure and the fixpoint is a star forest: every node
    points at its component's minimum.  Convergence is detected
    exactly (the canonical edge multiset stops changing — checked via
    a count + anti-join probe, a designed driver boundary like the
    min-label variant's changed-count); ``max_iters`` bounds the loop.
    """
    clean = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    # every touched node — nodes whose only edges are self-loops drop
    # out of the canonical pair set below but are still singleton
    # components (identical to the min-label variant's output)
    all_nodes = (
        clean.select(F.col("a").alias("node"))
        .unionByName(clean.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # canonical big->small pairs; self-loops dropped
    e = (
        clean.select(
            F.greatest("a", "b").alias("u"),
            F.least("a", "b").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def star(cur: DataFrame, large: bool) -> DataFrame:
        # neighbourhood view: for node x, its neighbours across both
        # directions of the canonical pairs
        nbrs = cur.select(F.col("u").alias("x"), F.col("v").alias("y")).unionByName(
            cur.select(F.col("v").alias("x"), F.col("u").alias("y"))
        )
        m = nbrs.groupBy("x").agg(F.min("y").alias("m"))
        m = m.select("x", F.least("x", "m").alias("m"))
        joined = nbrs.join(m, "x")
        if large:
            out = joined.where(F.col("y") > F.col("x")).select(
                F.col("y").alias("a"), F.col("m").alias("b")
            )
        else:
            out = (
                joined.where(F.col("y") <= F.col("x"))
                .select(F.col("y").alias("a"), F.col("m").alias("b"))
                .unionByName(m.select(F.col("x").alias("a"), F.col("m").alias("b")))
            )
        return (
            out.where(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("u"),
                F.least("a", "b").alias("v"),
            )
            .distinct()
        )

    for i in range(max_iters):
        # lineage cut every round, deliberately unconditional: the
        # convergence probe below materializes new_e twice (count +
        # anti-join), so the checkpoint is free and skipping it would
        # recompute the whole star-round prefix per probe
        new_e = star(star(e, large=True), large=False).localCheckpoint(
            eager=False
        )
        # exact convergence probe: same canonical edge multiset?
        n_new = new_e.count()
        changed = (
            n_new != e.count()
            or new_e.join(e, ["u", "v"], "left_anti").limit(1).count() > 0
        )
        e = new_e
        if stats is not None:
            stats["rounds"] = i + 1
        if not changed:
            break
    # fixpoint is a star forest: u -> v points every node at its
    # component min; everything not a member (roots, self-loop-only
    # and otherwise isolated-in-canonical nodes) is its own component
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    singletons = (
        all_nodes.join(members.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return members.unionByName(singletons)


def incremental_components(
    state: DataFrame | None,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """Merge a batch of NEW edges into an existing (node, component)
    mapping — the incremental face of :func:`connected_components`,
    for dedup-cluster / entity-resolution tables that must stay
    current as pairs stream in (re-running full CC over all history
    per batch is O(corpus); this is O(batch + touched components)).

    Returns the updated (node, component) rows for EXACTLY the
    affected nodes: the batch's endpoints plus every node of any
    component they touch (a merge relabels whole components, so their
    members must all be rewritable) — suitable for a node-keyed
    upsert.  Untouched components are probed by one semi-join and
    never rewritten.  ``state=None`` degrades to plain CC over the
    batch.

    Correctness: the existing mapping rides into the propagation as
    (node -> old_component) edges — old component ids ARE node ids
    (min labels), so connectivity within old components is preserved
    and the fixpoint label is the min node id over the MERGED
    component, exactly what full CC over (history + batch) yields for
    those nodes.  Replaying the same batch against the post-merge
    state returns the identical mapping (min is stable), so the merge
    is IDEMPOTENT — the property the streaming sink's replay safety
    rides on."""
    e = new_edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
    if state is None:
        return connected_components(new_edges, src, dst, max_iters=max_iters)
    batch_nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    touched = (
        state.join(batch_nodes, "node", "left_semi")
        .select("component")
        .distinct()
    )
    sub = state.join(touched, "component", "left_semi")
    graph = e.unionByName(
        sub.select(F.col("node").alias("__s"), F.col("component").alias("__d"))
    )
    return connected_components(graph, "__s", "__d", max_iters=max_iters)


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    include_zero: bool = True,
) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph of
    ``edges`` — the local-clustering primitive (spam-farm detection,
    community density, boilerplate-link screening in a crawl graph).
    Returns (node, triangles); the graph's total triangle count is
    ``sum(triangles) / 3``.

    Plan (the degree-ordered node-iterator of Schank & Wagner 2005 as
    popularized for MapReduce by Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW 2011):

    * canonicalize to simple undirected edges (drop self-loops/NULLs,
      least/greatest + distinct) — ONE aggregate-shaped shuffle;
    * orient every edge from its lower-(degree, id) endpoint to the
      higher one.  The orientation is acyclic and out-degrees are
      bounded by O(sqrt(m)), so the wedge join below cannot blow up on
      a hub node — the "last reducer" skew killer: a degree-D hub
      generates O(D^2) wedges under naive node-iteration but only
      O(m) across the whole graph once low-degree endpoints do the
      iterating;
    * wedges: self-join the oriented list on its source (each triangle
      is generated exactly once, at its (degree,id)-minimal vertex,
      with the two higher endpoints kept in orientation order);
    * close: ONE equi-join of the wedge (b, c) pairs against the
      oriented list itself.

    Every shuffle is keyed (no cross join, no global window); the
    oriented list is reused across both joins from one cached lineage.
    Degree-ordering needs degrees for BOTH endpoints: two joins of the
    canonical list against the node-degree frame (node-sized,
    broadcast-able for page/domain graphs).

    Orientation invariance: per-node triangle membership is a property
    of the undirected graph, so an id-ordered SQL oracle (LEAST /
    GREATEST joins) must produce identical counts even though this
    plan orients by degree.
    """
    e = edges.select(F.col(src).alias("__a"), F.col(dst).alias("__b")).where(
        F.col(src).isNotNull()
        & F.col(dst).isNotNull()
        & (F.col(src) != F.col(dst))
    )
    can = (
        e.select(
            F.least("__a", "__b").alias("u"),
            F.greatest("__a", "__b").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        can.select(F.col("u").alias("node"))
        .unionByName(can.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        can.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed(
                "deg", "dv"
            ),
            "v",
        )
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dhi"),
    ).localCheckpoint(eager=False)
    e1 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("b"), F.col("dhi").alias("db")
    )
    e2 = oriented.select(
        F.col("lo").alias("a"), F.col("hi").alias("c"), F.col("dhi").alias("dc")
    )
    wedges = e1.join(e2, "a").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(
        F.col("lo").alias("b"), F.col("hi").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    memb = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    cnt = memb.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    if not include_zero:
        return cnt
    nodes = deg.select("node")
    return nodes.join(cnt, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    max_iters: int = 5,
    stats: dict | None = None,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan,
    Albert & Kumara, Phys. Rev. E 2007 — the deterministic synchronous
    variant): every node starts as its own label; each round a node
    adopts the most frequent label among its neighbours, ties broken
    toward the SMALLEST label, isolated nodes keep their own.  Returns
    (node, label) after ``max_iters`` rounds or the earlier fixpoint.

    The classic asynchronous random-order LPA is non-deterministic by
    construction; the synchronous min-tie-break form trades some
    convergence speed for full reproducibility across runs, engines
    and partitionings — the property a data pipeline needs.  Known
    artifact, documented honestly: synchronous updates can 2-cycle on
    bipartite-ish structures; the loop detects only the exact fixpoint
    (zero labels changed) and otherwise stops at ``max_iters``, so an
    oscillating boundary node lands on the parity of the iteration
    count (still deterministic).  For a fixed-round contract, compare
    with a fixed-iteration oracle at the same ``max_iters``: early
    fixpoint stop is consistent (a fixpoint is invariant under further
    rounds).

    Scale shape: identical cost profile to a pagerank iteration —
    state is node-sized; each round is ONE equi-join (state ⋈ edges on
    src) + ONE (node, label) count aggregate + ONE keyed argmax
    (``max_by`` over the (count, −label) order — no window), plus the
    scalar convergence probe.  Lineage is cut with ``localCheckpoint``
    every round (the probe materializes the state anyway —
    connected_components' O(rounds²) rationale).

    ``stats``: pass a dict to receive ``{"rounds": n}``."""
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("__s"), F.col(src).alias("__d"))
        )
    e = (
        e.where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    state = nodes.select("node", F.col("node").alias("label"))
    for i in range(max_iters):
        counts = (
            state.join(e, state["node"] == e["__s"])
            .groupBy(F.col("__d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        # min over (−count, label): highest count first, then smallest
        # label — works for any orderable label type, no negation of
        # the label itself
        best = counts.groupBy("node").agg(
            F.min_by(
                "label",
                F.struct((-F.col("__c")).alias("__nc"), F.col("label")),
            ).alias("__new")
        )
        new_state = (
            state.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("__new"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_state.join(
                state.withColumnRenamed("label", "__old"), "node"
            )
            .where(F.col("label") != F.col("__old"))
            .count()
        )
        state = new_state
        if stats is not None:
            stats["rounds"] = i + 1
        if changed == 0:
            break
    return state
