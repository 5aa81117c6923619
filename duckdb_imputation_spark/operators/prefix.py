"""Distributed prefix sums over a global order — the scale-safe
replacement for ``Window.partitionBy(F.lit(0)).orderBy(...)``.

A single-partition window serializes the whole input through one task
(Spark logs ``WindowExec: No Partition Defined`` and moves ALL data to
one partition) — at 100 TB that is the difference between a running
pipeline and a dead one.  The fix is the classic hierarchical prefix
sum, expressed fully inside one Spark plan:

1. shard rows into order-preserving ranges of the order column
   (boundaries baked as literals from a cheap quantile sketch, so the
   assignment is a pure function of the row — AQE/retry/replan-proof,
   unlike ``spark_partition_id``);
2. one hash exchange on ``__shard`` feeds a window that computes BOTH
   the within-shard ROWS-frame prefix AND the shard total;
3. the distinct (shard, total) rows — at most ``n_shards`` of them —
   get an exclusive running total via a trivially small window, and
   broadcast-join back as per-shard offsets.

No driver-side collect, no checkpoint: the expensive input is computed
once (both branches read the same shuffle files via exchange reuse),
and the result is bit-identical to the global window for any boundary
placement (equal order keys land in one shard, so ties behave the
same).

The boundary sketch is one extra job over ``bounds_src`` (default: the
input itself).  When the order column exists upstream of an expensive
derivation — e.g. doc ids in a parquet scan feeding a tokenizer — pass
the pruned upstream frame so the sketch reads one integer column
instead of re-running the derivation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "equidepth_histogram",
    "order_preserving_shards",
    "global_running_sum",
    "global_row_number",
    "percent_rank_global",
    "rank_global",
    "dense_rank_global",
    "cume_dist_global",
    "global_ranks",
    "default_n_shards",
]


def _shard_bounds(df: DataFrame, order_col: str, n_shards: int) -> list[float]:
    """Approximate quantile boundaries of the (numeric) order column.
    Any placement is CORRECT — boundaries only balance work — so the
    cheap sketch (relativeError 0.001, one column-pruned pass) is fine."""
    if n_shards <= 1:
        return []
    qs = [i / n_shards for i in range(1, n_shards)]
    bounds = df.stat.approxQuantile(order_col, qs, 0.001)
    return sorted(set(bounds))


def order_preserving_shards(
    df: DataFrame,
    order_col: str,
    n_shards: int,
    bounds_src: DataFrame | None = None,
    bounds: list[float] | None = None,
) -> tuple[DataFrame, list[float]]:
    """Attach ``__shard`` — an order-preserving range id of ``order_col``
    (rows with a lower order value never get a higher shard).  The
    boundaries are baked literals: a pure row-local expression, no
    dependence on physical partitioning.  ``bounds_src`` optionally
    supplies a cheaper frame for the boundary sketch (see module
    docstring); a superset/subset of ``df``'s rows only shifts balance,
    never correctness.  ``bounds`` skips the sketch entirely — ANY
    boundary list is correct, so callers should sketch once per dataset
    version and reuse (the 100 TB pattern; see pack_documents_bins)."""
    if bounds is not None:
        bounds = sorted(set(bounds))
    else:
        src = bounds_src if bounds_src is not None else df
        bounds = _shard_bounds(src, order_col, n_shards)
    c = F.col(order_col)
    shard: Column = F.lit(0)
    for b in bounds:
        shard = shard + (c > F.lit(b)).cast("int")
    # coalesce makes __shard provably non-nullable (null order keys →
    # shard 0, where a null-first ordering puts them anyway): the later
    # offsets join then infers NO isnotnull filter, keeping both plan
    # branches byte-identical so the shard exchange is planned once and
    # its shuffle reused instead of re-running the upstream twice
    return df.withColumn("__shard", F.coalesce(shard, F.lit(0))), bounds


def _with_offsets(tagged: DataFrame, order_col: str | Column) -> DataFrame:
    """Join each row with ``__off`` — the per-shard total summed over all
    strictly-lower shards.  The shard total is read off the prefix
    column itself (``max_by(__loc, order)`` = the LAST prefix value —
    exact for any value signs), so this branch consumes exactly the
    same columns as the main branch and the expensive shard exchange is
    planned ONCE and reused (a groupBy straight off the values would
    let column pruning specialize a second scan).  The offsets frame is
    at most n_shards rows, ranked by a trivially small window and
    broadcast."""
    totals = tagged.groupBy("__shard").agg(
        F.max_by("__loc", order_col).alias("__tot")
    )
    # constant-valued but non-foldable partition key: one group (the
    # frame is bounded by n_shards rows) without the misleading
    # no-partition warning
    w = (
        Window.partitionBy(F.pmod(F.col("__shard"), F.lit(1)))
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__shard",
        F.coalesce(F.sum("__tot").over(w), F.lit(0)).cast("long").alias("__off"),
    )
    return tagged.join(F.broadcast(offsets), "__shard")


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    n_shards: int,
    out_col: str = "__running",
    exclusive: bool = False,
    bounds_src: DataFrame | None = None,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Running total of ``value_col`` over the global ``order_col`` order
    (module docstring pattern).  ``exclusive=True`` excludes the current
    row (the packing form).

    Equal order keys: the ROWS frame makes their relative order within
    the running sum arbitrary — pass a unique order column (same caveat
    as the global-window formulation this replaces)."""
    sharded, _ = order_preserving_shards(df, order_col, n_shards, bounds_src, bounds)
    w_loc = (
        Window.partitionBy("__shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = sharded.withColumn("__loc", F.sum(F.col(value_col)).over(w_loc))
    running = F.col("__off") + F.col("__loc")
    if exclusive:
        running = running - F.col(value_col)
    return (
        _with_offsets(tagged, order_col)
        .withColumn(out_col, running.cast("long"))
        .drop("__shard", "__loc", "__off")
    )


def global_row_number(
    df: DataFrame,
    order_col: str,
    n_shards: int,
    out_col: str = "__rn",
    bounds_src: DataFrame | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """row_number() over a global ORDER BY, distributed: per-shard
    row_number + the count of all strictly-lower shards.

    ``tiebreak_cols`` extends the order to (order_col, *tiebreak_cols)
    — e.g. rank a vocabulary by (-count, token).  Sharding still ranges
    over the numeric ``order_col`` alone, which is exact (equal primary
    keys land in ONE shard, where the window applies the tiebreaks),
    but a dominant tie class — think count=1 tokens under a zipfian
    distribution — concentrates in a single shard; bounded by the tie
    class size, not the corpus, yet worth knowing at 100 TB.  The
    offsets branch reads the shard total off the row that is maximal in
    the FULL composite order (struct max_by), so primary-key ties
    cannot return a mid-tie prefix value."""
    tb = [F.col(c) for c in (tiebreak_cols or [])]
    sharded, _ = order_preserving_shards(df, order_col, n_shards, bounds_src)
    w_loc = Window.partitionBy("__shard").orderBy(F.col(order_col), *tb)
    tagged = sharded.withColumn("__loc", F.row_number().over(w_loc))
    order_expr = F.struct(F.col(order_col), *tb) if tb else order_col
    return (
        _with_offsets(tagged, order_expr)
        .withColumn(out_col, (F.col("__off") + F.col("__loc")).cast("long"))
        .drop("__shard", "__loc", "__off")
    )


def default_n_shards(df: DataFrame) -> int:
    """Shard count for the two-pass prefix ops: the session's shuffle
    parallelism (at 100 TB set n_shards so each shard's rows fit one
    task comfortably — the offsets frame stays n_shards rows either
    way)."""
    try:
        return max(1, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        return 32


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    tiebreak_cols: list[str] | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of ``value_col`` —
    NTILE(n) semantics at scale: the first ``n mod k`` buckets hold
    ``ceil(n/k)`` rows, the rest ``floor(n/k)``, over the global order
    (value, tiebreaks...).  Returns one row per non-empty bucket:
    (bucket, n_rows, min_value, max_value).

    The classic SQL form — ``NTILE(k) OVER (ORDER BY value)`` — is a
    SINGLE-PARTITION window (the trap this repo's plan lint rejects);
    here the global rank rides :func:`global_row_number` (one range
    exchange + an n_shards-row offsets broadcast), the total count is a
    1-row scalar broadcast, and the bucket id is pure integer
    arithmetic on (rank, n) — so the histogram is exact, deterministic,
    and never funnels the data through one task.  Rows identical under
    the full sort order are interchangeable across a bucket boundary;
    the per-bucket aggregates are invariant to that choice, which is
    what makes the result comparable across engines."""
    ranked = global_row_number(
        df, value_col, n_shards, out_col="__edr",
        tiebreak_cols=tiebreak_cols,
    )
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    k = F.lit(n_buckets)
    r = F.col("__edr")
    nn = F.col("__n")
    q = F.floor(nn / k)
    rem = nn % k
    big_span = rem * (q + 1)
    bucket = F.when(
        r <= big_span, F.ceil(r / (q + 1))
    ).otherwise(rem + F.ceil((r - big_span) / q)).cast("long")
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def percent_rank_global(
    df: DataFrame,
    order_col: str,
    n_shards: int | None = None,
    out_col: str = "pct_rank",
    bounds_src: DataFrame | None = None,
) -> DataFrame:
    """``PERCENT_RANK() OVER (ORDER BY order_col)`` without the
    single-partition window: the rank-based quantile-normalization
    transform (map a feature to its empirical CDF position in [0, 1])
    at corpus scale.

    Construction: :func:`global_row_number` gives an arbitrary-within-
    ties global row number; SQL PERCENT_RANK needs the MIN row number
    of each tie class (rank with gaps), recovered with one keyed
    min-aggregate on the order value joined back (AQE broadcasts the
    tie-class frame while it is small); then
    ``(rank - 1) / (n - 1)`` with the single-row count broadcast.
    Bit-identical to the window form: the numerator and denominator
    are exact integers, divided once.  A single row (n = 1) maps to
    0.0, matching SQL."""
    shards = n_shards if n_shards is not None else default_n_shards(df)
    rn = global_row_number(
        df, order_col, shards, out_col="__prn", bounds_src=bounds_src
    )
    ranks = rn.groupBy(order_col).agg(
        F.min("__prn").alias("__prank"), F.max("__prn").alias("__pmax")
    )
    # total count = the max row number — one aggregate over the tiny
    # tie-class frame instead of a second corpus-wide pass over rn
    n = ranks.agg(F.max("__pmax").alias("__pn"))
    ranks = ranks.drop("__pmax")
    return (
        rn.join(ranks, order_col)
        .crossJoin(F.broadcast(n))
        .withColumn(
            out_col,
            F.when(F.col("__pn") > 1,
                   (F.col("__prank") - 1) / (F.col("__pn") - 1))
            .otherwise(F.lit(0.0)),
        )
        .drop("__prn", "__prank", "__pn")
    )


def rank_global(
    df: DataFrame,
    order_col: str,
    n_shards: int | None = None,
    out_col: str = "rank",
    bounds_src: DataFrame | None = None,
) -> DataFrame:
    """``RANK() OVER (ORDER BY order_col)`` at scale: shard-offset row
    number, then each tie class takes its MIN row number (rank with
    gaps).  One keyed min-aggregate + join back — no single-partition
    window."""
    shards = n_shards if n_shards is not None else default_n_shards(df)
    rn = global_row_number(
        df, order_col, shards, out_col="__grn", bounds_src=bounds_src
    )
    ranks = rn.groupBy(order_col).agg(F.min("__grn").alias("__gmin"))
    return (
        rn.join(ranks, order_col)
        .withColumn(out_col, F.col("__gmin").cast("long"))
        .drop("__grn", "__gmin")
    )


def dense_rank_global(
    df: DataFrame,
    order_col: str,
    n_shards: int | None = None,
    out_col: str = "dense_rank",
    bounds_src: DataFrame | None = None,
) -> DataFrame:
    """``DENSE_RANK() OVER (ORDER BY order_col)`` at scale: the global
    row number of each DISTINCT order value (tie classes collapse
    first, so the ranked frame is |distinct values| rows), joined
    back.  No gaps, no single-partition window."""
    shards = n_shards if n_shards is not None else default_n_shards(df)
    distinct = df.select(order_col).distinct()
    dr = global_row_number(
        distinct, order_col, shards, out_col="__gdr",
        bounds_src=bounds_src,
    )
    return df.join(dr, order_col).withColumn(
        out_col, F.col("__gdr").cast("long")
    ).drop("__gdr")


def cume_dist_global(
    df: DataFrame,
    order_col: str,
    n_shards: int | None = None,
    out_col: str = "cume_dist",
    bounds_src: DataFrame | None = None,
) -> DataFrame:
    """``CUME_DIST() OVER (ORDER BY order_col)`` at scale: each tie
    class takes its MAX row number over the total count — the
    right-continuous empirical CDF, the companion transform to
    :func:`percent_rank_global`."""
    shards = n_shards if n_shards is not None else default_n_shards(df)
    rn = global_row_number(
        df, order_col, shards, out_col="__crn", bounds_src=bounds_src
    )
    ranks = rn.groupBy(order_col).agg(F.max("__crn").alias("__cmax"))
    # total count = the max tie-class max — read off the tiny tie frame
    n = ranks.agg(F.max("__cmax").alias("__cn"))
    return (
        rn.join(ranks, order_col)
        .crossJoin(F.broadcast(n))
        .withColumn(out_col, F.col("__cmax") / F.col("__cn"))
        .drop("__crn", "__cmax", "__cn")
    )


def global_ranks(
    df: DataFrame,
    order_col: str,
    n_shards: int | None = None,
    rank_col: str | None = "rank",
    dense_rank_col: str | None = "dense_rank",
    percent_rank_col: str | None = "pct_rank",
    cume_dist_col: str | None = "cume_dist",
    bounds_src: DataFrame | None = None,
) -> DataFrame:
    """All four global ranking functions from ONE shard-offset pass —
    the fused form of :func:`rank_global` / :func:`dense_rank_global` /
    :func:`percent_rank_global` / :func:`cume_dist_global` (pass
    ``None`` for any output column to skip it).

    One :func:`global_row_number` ranks the input once (one range
    exchange + the n_shards-row offsets broadcast); a single keyed
    aggregate over the order value then yields each tie class's MIN
    row number (= RANK), MAX row number (→ CUME_DIST), and its own
    global row number over the |distinct|-sized class frame
    (= DENSE_RANK, re-ranking only the tiny checkpointed class frame —
    n_shards of work, not corpus); PERCENT_RANK and CUME_DIST
    divide by the 1-row total broadcast.  Output values are
    bit-identical to the four individual operators (asserted in
    tests/test_prefix.py) at a quarter of the exchanges: the separate
    operators re-rank the corpus once EACH.

    Scale shape: one range exchange of the corpus + one tie-class
    aggregate (map-side combined) + two broadcast joins (tie frame
    while small — AQE decides — and the scalar count)."""
    shards = n_shards if n_shards is not None else default_n_shards(df)
    rn = global_row_number(
        df, order_col, shards, out_col="__arn", bounds_src=bounds_src
    )
    classes = rn.groupBy(order_col).agg(
        F.min("__arn").alias("__amin"),
        F.max("__arn").alias("__amax"),
    )
    # the class frame is distinct-value-sized but its lineage contains
    # the corpus-wide ranking pass; the dense-rank shard sketch below
    # and the scalar total would each re-run that pass.  A LAZY local
    # checkpoint materializes the tiny frame on its first use and every
    # later job reads the materialized rows instead of re-ranking the
    # corpus (measured on the catalog row: 7.5 s -> 3.9 s at sf0.1).
    classes = classes.localCheckpoint(eager=False)
    if dense_rank_col is not None:
        # the class frame is |distinct values| rows; a window ordered by
        # the class min row number gives DENSE_RANK without touching the
        # corpus again.  Partitioning by a constant would be the
        # single-partition trap on a CORPUS frame; here the frame is
        # distinct-value-sized — still, rank it via the same shard
        # machinery to stay lint-clean at any distinct cardinality.
        classes = global_row_number(
            classes, "__amin", shards, out_col="__adr"
        )
    # the total row count is the max tie-class MAX row number — read it
    # off the class frame (distinct-value-sized) instead of spending
    # another corpus-wide aggregate on rn
    n = classes.agg(F.max("__amax").alias("__an"))
    out = rn.join(classes, order_col).crossJoin(F.broadcast(n))
    if rank_col is not None:
        out = out.withColumn(rank_col, F.col("__amin").cast("long"))
    if dense_rank_col is not None:
        out = out.withColumn(dense_rank_col, F.col("__adr").cast("long"))
    if percent_rank_col is not None:
        out = out.withColumn(
            percent_rank_col,
            F.when(
                F.col("__an") > 1,
                (F.col("__amin") - 1) / (F.col("__an") - 1),
            ).otherwise(F.lit(0.0)),
        )
    if cume_dist_col is not None:
        out = out.withColumn(
            cume_dist_col, F.col("__amax") / F.col("__an")
        )
    drop = ["__arn", "__amin", "__amax", "__an"]
    if dense_rank_col is not None:
        drop.append("__adr")
    return out.drop(*drop)
