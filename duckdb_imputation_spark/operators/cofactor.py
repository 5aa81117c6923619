"""Distributed cofactor ("triple") aggregation — the engine's central operator.

Spark-first re-expression of the reference's fused lift+sum aggregate
``sum_to_triple_<x>_<y>(cols...)`` (duckdb_extension/src/triple/sum/
sum_no_lift.cpp:53-216, registered for x,y in 0..19 at
duckdb_imputation_extension.cpp:80-113) and of ``sum_triple`` over
pre-built triples (triple/sum/sum.cpp:57-261).  One generic Python
generator replaces all 399 C++ instantiations (SURVEY §2.1 #3).

Execution strategy (designed for 100 TB, not just small SF):

* **Dense part** (N, Σx_i, Σx_i·x_j): plain ``groupBy().agg`` over
  ``count``/``sum`` expressions.  Catalyst plans partial+final hash
  aggregation with whole-stage codegen — the exact analogue of the
  reference's SumState update/combine (sum_state.cpp:10-114), with the
  map-side combine reducing shuffle traffic to one partial row per
  (partition × group).
* **Sparse categorical part**: one ``posexplode`` producing (cat_idx, key)
  entries, aggregated by (group, cat_idx, key).  Shuffle volume is bounded
  by Σ|categories| per group *after* map-side partial aggregation, never by
  row count.  Category-pair co-occurrences get the same treatment over the
  c(c+1)/2 pair list.  Maps are then assembled per group with
  ``collect_list`` (bounded by the category dictionary size, which the
  reference also assumes driver-resident, partition.cpp:34-37).
* The three grouped results are joined on the (null-safe) group keys; all
  three shuffles hash on the same keys, so AQE/exchange reuse keeps this to
  co-partitioned joins.

Everything is JVM-side Column expressions — no Python UDF in the hot path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.triple import cat_pairs, n_quad

__all__ = ["sum_to_triple", "sum_to_triples_conditional", "sum_triples", "lift_columns"]

_KV_T = "array<struct<key:int,value:double>>"
_KKV_T = "array<struct<key1:int,key2:int,value:double>>"

# Collect-strategy assembly gate (r14): groups with at most this many
# collected rows build their categorical maps with the filter-per-key
# form (cheap int compares, bounded <= rows² ops); larger groups take
# the sort+fold form (O(rows log rows + keys)).  Both forms are
# value-identical; the If is evaluated per group at runtime, so one
# frame can mix shapes.  Same-session A/B on the factorized-join shape
# (1-7 rows/group): filter 1.42 s vs fold-always 1.92 s noop — and the
# fold's struct-allocation constant only pays for itself once a group's
# rows × keys product is well past rows·log(rows).
_COLLECT_FOLD_MIN_ROWS = 64

# Fused-dense cutover (r13, re-validated r14): the single-scan fused
# cofactor gates d(d+1)/2 quad products on each of the (fan + 1)
# exploded entries per row, so its per-row overhead is ~fan × quads;
# above this product the two-scan plan (dedicated dense aggregate +
# broadcast join) wins.  Module-level so the A/B harness can flip it
# without editing the operator; both branches are value-identical.
_FUSE_DENSE_MAX = 96


def _join_on(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> DataFrame:
    # Rename the right side's keys first: both sides usually derive from the
    # same base plan, and Spark's self-join attribute resolution would make
    # ``left[k] == right[k]`` ambiguous otherwise.
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__rhs_{k}")
    if not keys or list(keys) == ["__g"]:
        # keyless combine, or the internal constant dummy key ("__g" =
        # lit(0)): both sides are SINGLE-ROW global aggregates, and
        # Catalyst constant-folds the dummy-key equality to TRUE — an
        # unhinted join then plans as CartesianProduct under the
        # measured-sizes broadcast posture (session.py, r9).
        # Broadcast the 1-row side explicitly.
        out = left.join(F.broadcast(renamed), F.lit(True), "inner")
        return out.drop(*[f"__rhs_{k}" for k in keys])
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__rhs_{k}"))
        cond = c if cond is None else cond & c
    out = left.join(renamed, cond, "inner")
    return out.drop(*[f"__rhs_{k}" for k in keys])


def _quad_pairs(num_cols: Sequence[str], nb: bool) -> list[tuple[int, int]]:
    d = len(num_cols)
    if nb:
        return [(i, i) for i in range(d)]
    return [(i, j) for i in range(d) for j in range(i, d)]


def sum_to_triple(
    df: DataFrame,
    num_cols: Sequence[str],
    cat_cols: Sequence[str] = (),
    group_by: Sequence[str] = (),
    nb: bool = False,
    result_col: str = "triple",
    strategy: str = "twolevel",
    max_categories: int | None = None,
) -> DataFrame:
    """Aggregate ``df`` into one triple per group.

    Continuous columns are cast to double, categorical to int — the
    num-before-cat / FLOAT-vs-INTEGER convention of the reference
    (README.md:126, lift.cpp:31-38) made explicit by two parameters.

    With ``nb=True`` produces the Naive-Bayes aggregate
    (``sum_to_nb_agg``: diagonal quad, no num×cat / cat×cat parts,
    sum_to_nb_agg.cpp:39-146).

    Returns a DataFrame with the ``group_by`` columns plus ``result_col``
    (struct shaped like :func:`~duckdb_imputation_spark.functions.triple
    .triple_schema`).
    """
    num_cols = list(num_cols)
    cat_cols = list(cat_cols)
    group_by = list(group_by)
    d, c = len(num_cols), len(cat_cols)

    overlap = set(num_cols) & set(cat_cols)
    if overlap:
        raise ValueError(
            f"columns cannot be both continuous and categorical: {sorted(overlap)}"
        )
    clash = (set(num_cols) | set(cat_cols)) & set(group_by)
    if clash:
        raise ValueError(f"group keys overlap aggregated columns: {sorted(clash)}")

    if max_categories is not None and c > 0:
        # Opt-in scale guard: the categorical maps (and the driver-side
        # dictionaries the ML path builds from them, partition.cpp:34-37)
        # are only safe for bounded-cardinality columns.  One cheap
        # approx-distinct scan up front beats an executor OOM later.
        counts = df.agg(
            *[F.approx_count_distinct(col).alias(col) for col in cat_cols]
        ).collect()[0]
        bad = {col: counts[col] for col in cat_cols if counts[col] > max_categories}
        if bad:
            raise ValueError(
                f"categorical columns exceed max_categories={max_categories}: "
                f"{bad} — these look like IDs, not categories"
            )

    if strategy == "collect" and c > 0:
        return _sum_to_triple_collect(
            df, num_cols, cat_cols, group_by, nb=nb, result_col=result_col
        )
    if strategy == "pandas":
        return _sum_to_triple_pandas(
            df, num_cols, cat_cols, group_by, nb=nb, result_col=result_col
        )
    if strategy not in ("twolevel", "collect", "pandas"):
        raise ValueError(f"unknown strategy {strategy!r}")

    internal_key = not group_by
    if internal_key:
        df = df.withColumn("__g", F.lit(0))
        group_by = ["__g"]

    nums = [F.col(col).cast("double").alias(f"__x{i}") for i, col in enumerate(num_cols)]
    cats = [F.col(col).cast("int").alias(f"__k{j}") for j, col in enumerate(cat_cols)]
    base = df.select(*group_by, *nums, *cats)

    if c == 0:
        # ---- dense-only: pure codegen'd partial+final hash aggregation ---
        quad_idx = _quad_pairs(num_cols, nb)
        dense_aggs = [F.expr("count(1)").alias("__n")]
        dense_aggs += [F.expr(f"sum(__x{i})").alias(f"__lin_{i}") for i in range(d)]
        dense_aggs += [
            F.expr(f"sum(__x{i} * __x{j})").alias(f"__quad_{p}")
            for p, (i, j) in enumerate(quad_idx)
        ]
        dense = base.groupBy(*group_by).agg(*dense_aggs)

        lin_arr = (
            F.expr(
                "array(" + ", ".join(f"coalesce(__lin_{i}, 0.0d)" for i in range(d)) + ")"
            )
            if d
            else F.expr("array()").cast("array<double>")
        )
        quad_arr = (
            F.expr(
                "array("
                + ", ".join(f"coalesce(__quad_{p}, 0.0d)" for p in range(len(quad_idx)))
                + ")"
            )
            if d
            else F.expr("array()").cast("array<double>")
        )
        fields = [
            F.col("__n").alias("N"),
            lin_arr.alias("lin_agg"),
            quad_arr.alias("quad_agg"),
            F.expr("array()").cast(f"array<{_KV_T}>").alias("lin_cat"),
        ]
        if not nb:
            fields += [
                F.expr("array()").cast(f"array<{_KV_T}>").alias("quad_num_cat"),
                F.expr("array()").cast(f"array<{_KKV_T}>").alias("quad_cat"),
            ]
        out = dense.select(*group_by, F.struct(*fields).alias(result_col))
        return out.drop("__g") if internal_key else out

    # ---- sparse (+ optionally dense) two-level aggregation ---------------
    carry_sums = d > 0 and not nb
    quad_idx = _quad_pairs(num_cols, nb)
    n_pairs = len(cat_pairs(c)) if not nb else 0
    fan = c + n_pairs  # sparse entries per input row

    # Fused single-scan shape (r13, guide §2.4 — remove passes/shuffles
    # outright): the dense stats ride as ONE extra tagged pseudo-entry
    # (kind 2) through the same explode → two-level aggregation,
    # removing the second full scan of the input and the dense⋈sparse
    # join.  Value-identical: the kind-2 group receives exactly one
    # entry per input row in row order, so its count/sums accumulate
    # exactly as the dedicated dense aggregate did.  The fused
    # aggregate gates the d(d+1)/2 quad products per exploded entry,
    # so its overhead grows with fan-out × quad width; measured at
    # sf0.1 it wins for narrow shapes (3 num × 2 cat: ~2 s → ~1 s
    # noop) and loses for the wide one (8 num × 4 cat: 2.3 s → 5.5 s —
    # 14 sparse entries × 44 gated quads beat the saved scan).  The
    # data-independent criterion below picks fused exactly when the
    # per-entry gating work is small; either branch returns the same
    # values, only the plan differs.
    fuse_dense = fan * max(len(quad_idx), 1) <= _FUSE_DENSE_MAX

    def _estruct(kind: int, idx: int, e1: str, e2: str) -> str:
        return (
            f"named_struct('__kind', {kind}, '__idx', CAST({idx} AS INT), "
            f"'__e1', {e1}, '__e2', {e2})"
        )

    entry_sqls = [_estruct(2, 0, "0", "0")] if fuse_dense else []
    entry_sqls += [_estruct(0, j, f"__k{j}", "0") for j in range(c)]
    if not nb:
        entry_sqls += [
            _estruct(1, p, f"__k{a}", f"__k{b}")
            for p, (a, b) in enumerate(cat_pairs(c))
        ]
    carry_x = [F.col(f"__x{i}") for i in range(d)] if (carry_sums or fuse_dense) else []
    exploded = base.select(
        *group_by,
        *carry_x,
        F.explode(F.expr("array(" + ", ".join(entry_sqls) + ")")).alias("__e"),
    ).select(
        *group_by,
        *carry_x,
        F.col("__e.__kind").alias("__kind"),
        F.col("__e.__idx").alias("__idx"),
        F.col("__e.__e1").alias("__e1"),
        F.col("__e.__e2").alias("__e2"),
    )
    dense_kind = F.col("__kind") == 2
    # linear sums: needed on kind-0 entries when carry_sums (the
    # num×cat maps) and on the kind-2 entry (lin_agg); quad products
    # only on kind-2 (gated so the multiplies run once per input row,
    # not once per sparse copy)
    sum_aggs = []
    quad_aggs = []
    if carry_sums:
        sum_aggs = [F.sum(F.col(f"__x{i}")).alias(f"__s{i}") for i in range(d)]
    elif fuse_dense and d:
        sum_aggs = [
            F.sum(F.when(dense_kind, F.col(f"__x{i}"))).alias(f"__s{i}")
            for i in range(d)
        ]
    if fuse_dense:
        quad_aggs = [
            F.sum(
                F.when(dense_kind, F.col(f"__x{i}") * F.col(f"__x{j}"))
            ).alias(f"__q{p}")
            for p, (i, j) in enumerate(quad_idx)
        ]
    per_key = exploded.groupBy(*group_by, "__kind", "__idx", "__e1", "__e2").agg(
        F.count(F.lit(1)).alias("__cnt"),
        *sum_aggs,
        *quad_aggs,
    )
    entries = per_key.groupBy(*group_by).agg(
        F.collect_list(
            F.struct(
                "__kind",
                "__idx",
                "__e1",
                "__e2",
                "__cnt",
                *[f"__s{i}" for i in range(len(sum_aggs))],
                *[f"__q{p}" for p in range(len(quad_aggs))],
            )
        ).alias("__entries")
    )

    # assembly generated as SQL text: one F.expr parse instead of a py4j
    # round trip per sub-expression (the Column-object version dominated
    # wall clock at small scale factors)
    def _single(j: int, value_field: str, cast: bool = False) -> str:
        val = f"x.{value_field}"
        if cast:
            val = f"CAST({val} AS DOUBLE)"
        return (
            f"sort_array(transform(filter(__entries, x -> x.__kind = 0 AND "
            f"x.__idx = {j}), x -> named_struct('key', x.__e1, 'value', "
            f"coalesce({val}, CAST(0.0 AS DOUBLE)))))"
        )

    def _pair(p: int) -> str:
        return (
            f"sort_array(transform(filter(__entries, x -> x.__kind = 1 AND "
            f"x.__idx = {p}), x -> named_struct('key1', x.__e1, 'key2', "
            f"x.__e2, 'value', CAST(x.__cnt AS DOUBLE))))"
        )

    lin_cat = F.expr(
        "array(" + ", ".join(_single(j, "__cnt", cast=True) for j in range(c)) + ")"
    )
    quad_num_cat = (
        F.expr(
            "array("
            + ", ".join(_single(j, f"__s{i}") for i in range(d) for j in range(c))
            + ")"
        )
        if carry_sums
        else F.expr("array()").cast(f"array<{_KV_T}>")
    )
    quad_cat = (
        F.expr(
            "array(" + ", ".join(_pair(p) for p in range(len(cat_pairs(c)))) + ")"
        )
        if not nb
        else None
    )

    if fuse_dense:
        _dense_e = "element_at(filter(__entries, x -> x.__kind = 2), 1)"
        lin_arr = (
            F.expr(
                "array("
                + ", ".join(f"coalesce({_dense_e}.__s{i}, 0.0d)" for i in range(d))
                + ")"
            )
            if d
            else F.expr("array()").cast("array<double>")
        )
        quad_arr = (
            F.expr(
                "array("
                + ", ".join(
                    f"coalesce({_dense_e}.__q{p}, 0.0d)"
                    for p in range(len(quad_idx))
                )
                + ")"
            )
            if d
            else F.expr("array()").cast("array<double>")
        )
        fields = [
            F.expr(f"{_dense_e}.__cnt").alias("N"),
            lin_arr.alias("lin_agg"),
            quad_arr.alias("quad_agg"),
            lin_cat.alias("lin_cat"),
        ]
        if not nb:
            fields += [quad_num_cat.alias("quad_num_cat"), quad_cat.alias("quad_cat")]
        out = entries.select(*group_by, F.struct(*fields).alias(result_col))
        return out.drop("__g") if internal_key else out

    # wide shape: dedicated dense aggregate (second scan) + join — the
    # quad products run once per input row with no per-entry gating
    dense_aggs = [F.expr("count(1)").alias("__n")]
    dense_aggs += [F.expr(f"sum(__x{i})").alias(f"__lin_{i}") for i in range(d)]
    dense_aggs += [
        F.expr(f"sum(__x{i} * __x{j})").alias(f"__quad_{p}")
        for p, (i, j) in enumerate(quad_idx)
    ]
    dense = base.groupBy(*group_by).agg(*dense_aggs)
    lin_arr = (
        F.expr(
            "array(" + ", ".join(f"coalesce(__lin_{i}, 0.0d)" for i in range(d)) + ")"
        )
        if d
        else F.expr("array()").cast("array<double>")
    )
    quad_arr = (
        F.expr(
            "array("
            + ", ".join(f"coalesce(__quad_{p}, 0.0d)" for p in range(len(quad_idx)))
            + ")"
        )
        if d
        else F.expr("array()").cast("array<double>")
    )
    merged = _join_on(dense, entries, group_by)
    fields = [
        F.col("__n").alias("N"),
        lin_arr.alias("lin_agg"),
        quad_arr.alias("quad_agg"),
        lin_cat.alias("lin_cat"),
    ]
    if not nb:
        fields += [quad_num_cat.alias("quad_num_cat"), quad_cat.alias("quad_cat")]
    out = merged.select(*group_by, F.struct(*fields).alias(result_col))
    return out.drop("__g") if internal_key else out


def lift_columns(
    num_cols: Sequence[str], cat_cols: Sequence[str] = (), nb: bool = False
) -> Column:
    """Per-row lift ``to_cofactor(cols...)`` as a Column expression
    (reference lift.cpp:15-243 / lift_to_nb_agg.cpp:13-136).

    Provided for parity and for composing with :func:`sum_triples`; the
    fused :func:`sum_to_triple` should be preferred — it never materializes
    per-row triples (README.md:136).
    """
    d, c = len(num_cols), len(cat_cols)
    xs = [F.col(col).cast("double") for col in num_cols]
    ks = [F.col(col).cast("int") for col in cat_cols]
    quad_pairs = [(i, i) for i in range(d)] if nb else [
        (i, j) for i in range(d) for j in range(i, d)
    ]
    one = F.lit(1.0)

    def kv(k: Column, v: Column) -> Column:
        return F.array(F.struct(k.alias("key"), v.alias("value")))

    fields = [
        F.lit(1).cast("long").alias("N"),
        F.array(*xs).cast("array<double>").alias("lin_agg"),
        F.array(*[xs[i] * xs[j] for (i, j) in quad_pairs])
        .cast("array<double>")
        .alias("quad_agg"),
        (
            F.array(*[kv(ks[j], one) for j in range(c)])
            if c
            else F.expr("array()").cast(f"array<{_KV_T}>")
        ).alias("lin_cat"),
    ]
    if not nb:
        fields += [
            (
                F.array(*[kv(ks[j], xs[i]) for i in range(d) for j in range(c)])
                if c and d
                else F.expr("array()").cast(f"array<{_KV_T}>")
            ).alias("quad_num_cat"),
            (
                F.array(
                    *[
                        F.array(
                            F.struct(
                                ks[a].alias("key1"),
                                ks[b].alias("key2"),
                                one.alias("value"),
                            )
                        )
                        for (a, b) in cat_pairs(c)
                    ]
                )
                if c
                else F.expr("array()").cast(f"array<{_KKV_T}>")
            ).alias("quad_cat"),
        ]
    return F.struct(*fields)


def sum_triples(
    df: DataFrame,
    triple_col: str,
    d_num: int,
    d_cat: int,
    group_by: Sequence[str] = (),
    nb: bool = False,
    result_col: str = "triple",
    flat_entries: bool = False,
) -> DataFrame:
    """⊕-aggregate a column of triples (reference ``sum_triple``,
    sum.cpp:57-261) — e.g. after :mod:`multiply` in a factorized join.

    Single-pass: each triple is lowered to flat entry rows with ONE
    generate (so the upstream plan executes once — an earlier 4-scan
    version re-ran the whole upstream join per statistic family), summed
    with one grouped aggregation (map-side combine bounds the shuffle by
    the number of distinct statistics, not input rows), and reassembled
    into the nested struct with one more grouping.

    ``flat_entries=True`` (r14, guide §1.2 — don't compute things you
    throw away) returns the summed FLAT entry rows directly
    (``group_by..., part, i, j, k1, k2, val`` — the
    :func:`~.flatten.flatten_triple` layout) and skips the nested
    reassembly.  For callers that would immediately re-flatten the
    nested struct (both factorized-join query rows), the round trip is
    value-identical row for row: re-flattening the assembled struct
    emits exactly one row per summed ``(part, i, j, k1, k2)`` group
    with the summed ``val`` passed through unchanged (``N`` makes an
    exact double→bigint→double round trip — counts are integral and
    ≪ 2^53), only in a different (order-insensitive) row order — while
    the plan drops one single-row exchange, two ObjectHashAggregates
    (collect_list) and the two widest projections.
    """
    from .flatten import flatten_triple  # local import to avoid a cycle

    group_by = list(group_by)
    internal_key = not group_by
    if internal_key:
        df = df.withColumn("__g", F.lit(0))
        group_by = ["__g"]
    d, c = d_num, d_cat

    entries = flatten_triple(df, d, c, group_by, nb=nb, triple_col=triple_col)
    summed = entries.groupBy(*group_by, "part", "i", "j", "k1", "k2").agg(
        F.sum("val").alias("val")
    )
    if flat_entries:
        return summed.drop("__g") if internal_key else summed
    assembled = summed.groupBy(*group_by).agg(
        F.collect_list(F.struct("part", "i", "j", "k1", "k2", "val")).alias("__e")
    )

    # reassembly generated as SQL text (single parse, no per-expression
    # py4j round trips)
    def match(part: str, i: int, j: int) -> str:
        return f"filter(__e, x -> x.part = '{part}' AND x.i = {i} AND x.j = {j})"

    def scalar(part: str, i: int, j: int) -> str:
        return f"element_at({match(part, i, j)}, 1).val"

    def kv_list(part: str, i: int, j: int) -> str:
        return (
            f"sort_array(transform({match(part, i, j)}, "
            f"x -> named_struct('key', x.k1, 'value', x.val)))"
        )

    def kkv_list(i: int, j: int) -> str:
        return (
            f"sort_array(transform({match('quad_cat', i, j)}, "
            f"x -> named_struct('key1', x.k1, 'key2', x.k2, 'value', x.val)))"
        )

    quad_pairs = [(i, i) for i in range(d)] if nb else [
        (i, j) for i in range(d) for j in range(i, d)
    ]
    fields = [
        F.expr(f"CAST({scalar('N', -1, -1)} AS BIGINT)").alias("N"),
        (
            F.expr("array(" + ", ".join(scalar("lin", i, -1) for i in range(d)) + ")")
            if d
            else F.expr("array()").cast("array<double>")
        ).alias("lin_agg"),
        (
            F.expr(
                "array("
                + ", ".join(scalar("quad", i, j) for (i, j) in quad_pairs)
                + ")"
            )
            if d
            else F.expr("array()").cast("array<double>")
        ).alias("quad_agg"),
        (
            F.expr(
                "array(" + ", ".join(kv_list("lin_cat", j, -1) for j in range(c)) + ")"
            )
            if c
            else F.expr("array()").cast(f"array<{_KV_T}>")
        ).alias("lin_cat"),
    ]
    if not nb:
        fields += [
            (
                F.expr(
                    "array("
                    + ", ".join(
                        kv_list("quad_num_cat", i, j)
                        for i in range(d)
                        for j in range(c)
                    )
                    + ")"
                )
                if c and d
                else F.expr("array()").cast(f"array<{_KV_T}>")
            ).alias("quad_num_cat"),
            (
                F.expr(
                    "array(" + ", ".join(kkv_list(a, b) for (a, b) in cat_pairs(c)) + ")"
                )
                if c
                else F.expr("array()").cast(f"array<{_KKV_T}>")
            ).alias("quad_cat"),
        ]
    out = assembled.select(*group_by, F.struct(*fields).alias(result_col))
    return out.drop("__g") if internal_key else out


def _sum_to_triple_collect(
    df: DataFrame,
    num_cols: list[str],
    cat_cols: list[str],
    group_by: list[str],
    nb: bool = False,
    result_col: str = "triple",
) -> DataFrame:
    """Small-groups cofactor: ONE groupBy; categorical maps are assembled
    from the group's collected rows with higher-order functions.

    4x faster than the two-level path when groups are tiny (e.g. grouping
    by a join key before ⊗ — the factorized-join sides), because it
    avoids two extra shuffles and a join.  Per-group assembly cost since
    r14 is min(rows × keys with rows ≤ 64, rows log rows + keys): small
    groups keep the filter-per-key form, large groups switch to a
    sort+fold at runtime (a lazy size gate — see the inline note), so a
    group with many rows AND many distinct keys can no longer go
    quadratic.  The whole group's rows must still fit one aggregation
    buffer, so the default two-level strategy remains the choice for
    large groups — it stays map-side-combine-bounded.
    """
    d, c = len(num_cols), len(cat_cols)
    internal_key = not group_by
    if internal_key:
        df = df.withColumn("__g", F.lit(0))
        group_by = ["__g"]
    nums = [F.col(x).cast("double").alias(f"__x{i}") for i, x in enumerate(num_cols)]
    cats = [F.col(x).cast("int").alias(f"__k{j}") for j, x in enumerate(cat_cols)]
    base = df.select(*group_by, *nums, *cats)

    quad_idx = _quad_pairs(num_cols, nb)
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [F.sum(F.col(f"__x{i}")).alias(f"__lin_{i}") for i in range(d)]
    aggs += [
        F.sum(F.col(f"__x{i}") * F.col(f"__x{j}")).alias(f"__quad_{p}")
        for p, (i, j) in enumerate(quad_idx)
    ]
    aggs.append(
        F.collect_list(
            F.struct(
                *[F.col(f"__k{j}") for j in range(c)],
                *[F.col(f"__x{i}") for i in range(d)],
            )
        ).alias("__rows")
    )
    g = base.groupBy(*group_by).agg(*aggs)
    # builders generated as SQL text — see flatten_triple for why.
    #
    # r14 (VERDICT r13 #3, guide §1.2): the per-key map assembly used to
    # run one filter() scan of __rows PER DISTINCT KEY — O(rows × keys)
    # per group unconditionally, the engine's worst asymptotic path for
    # high-cardinality categoricals at 100 TB.  Each map now has TWO
    # value-identical forms chosen PER GROUP at runtime by a lazy
    # size(__rows) gate (Catalyst's If evaluates only the taken branch):
    #   * small groups (<= _COLLECT_FOLD_MIN_ROWS rows) keep the
    #     filter-per-key form — its per-element work is a bare int
    #     compare, which beats the fold's struct allocations up to
    #     ~rows² bounded cheap ops (same-session A/B at the
    #     factorized-join shape, 1-7 rows/group: filter 1.42 s vs
    #     fold-always 1.92 s noop);
    #   * large groups take ONE array_sort + ONE segmented aggregate()
    #     fold — O(rows log rows + keys), so a group with many rows and
    #     many keys can no longer go quadratic.
    # Value identity of the fold form, bit for bit:
    #   * key SET and ORDER: the sort key leads with an is-null flag, so
    #     distinct keys come out ascending with NULL last — exactly
    #     array_sort(array_distinct(<int array>))'s placement (primitive
    #     array_sort puts nulls last; a bare struct sort would put the
    #     NULL key FIRST, hence the flag);
    #   * per-key float sums: the 'pos' field (the element's __rows
    #     index) breaks ties inside a key, so each key's x values fold
    #     in __rows order — the same order filter() preserved — and the
    #     fold starts from the same CAST(0.0 AS DOUBLE) seed;
    #   * counts stay exact (small-integer double increments).
    # The per-key sums/counts themselves are what they always were; only
    # the assembly loop changed shape.
    _d_sums = 0 if nb else d

    def _hybrid(filter_form: str, fold_form: str) -> str:
        return (
            f"IF(size(__rows) <= {_COLLECT_FOLD_MIN_ROWS}, "
            f"{filter_form}, {fold_form})"
        )

    def _col_keys(j: int) -> str:
        return f"array_sort(array_distinct(transform(__rows, e -> e.__k{j})))"

    def _kv_count_filter(j: int) -> str:
        return (
            f"transform({_col_keys(j)}, k -> named_struct('key', k, 'value', "
            f"CAST(size(filter(__rows, e -> e.__k{j} <=> k)) AS DOUBLE)))"
        )

    def _kv_sum_filter(i: int, j: int) -> str:
        return (
            f"transform({_col_keys(j)}, k -> named_struct('key', k, 'value', "
            f"aggregate(filter(__rows, e -> e.__k{j} <=> k), "
            f"CAST(0.0 AS DOUBLE), (a, e) -> a + e.__x{i})))"
        )

    def _kkv_filter(a: int, b: int) -> str:
        pair_keys = (
            f"array_sort(array_distinct(transform(__rows, "
            f"e -> named_struct('key1', e.__k{a}, 'key2', e.__k{b}))))"
        )
        return (
            f"transform({pair_keys}, kk -> named_struct("
            f"'key1', kk.key1, 'key2', kk.key2, 'value', "
            f"CAST(size(filter(__rows, e -> e.__k{a} <=> kk.key1 AND "
            f"e.__k{b} <=> kk.key2)) AS DOUBLE)))"
        )

    def _fold_single(j: int) -> str:
        elem = (
            f"named_struct('nl', CAST((e.__k{j} IS NULL) AS INT), "
            f"'k', e.__k{j}, 'pos', i"
            + "".join(f", '__x{i}', e.__x{i}" for i in range(_d_sums))
            + ")"
        )
        sorted_arr = f"array_sort(transform(__rows, (e, i) -> {elem}))"
        out_t = (
            "array<struct<key:int,cnt:double"
            + "".join(f",s{i}:double" for i in range(_d_sums))
            + ">>"
        )
        acc0 = (
            f"named_struct('out', CAST(array() AS {out_t}), 'has', false, "
            f"'k', CAST(NULL AS INT), 'cnt', CAST(0.0 AS DOUBLE)"
            + "".join(f", 's{i}', CAST(0.0 AS DOUBLE)" for i in range(_d_sums))
            + ")"
        )
        entry = (
            "named_struct('key', acc.k, 'cnt', acc.cnt"
            + "".join(f", 's{i}', acc.s{i}" for i in range(_d_sums))
            + ")"
        )
        flush = f"IF(acc.has, concat(acc.out, array({entry})), acc.out)"
        same = (
            f"named_struct('out', acc.out, 'has', true, 'k', acc.k, "
            f"'cnt', acc.cnt + CAST(1.0 AS DOUBLE)"
            + "".join(f", 's{i}', acc.s{i} + e.__x{i}" for i in range(_d_sums))
            + ")"
        )
        new = (
            f"named_struct('out', {flush}, 'has', true, 'k', e.k, "
            f"'cnt', CAST(0.0 AS DOUBLE) + CAST(1.0 AS DOUBLE)"
            + "".join(
                f", 's{i}', CAST(0.0 AS DOUBLE) + e.__x{i}"
                for i in range(_d_sums)
            )
            + ")"
        )
        return (
            f"aggregate({sorted_arr}, {acc0}, "
            f"(acc, e) -> IF(acc.has AND (acc.k <=> e.k), {same}, {new}), "
            f"acc -> {flush})"
        )

    def kv_count(j: int) -> str:
        return _hybrid(
            _kv_count_filter(j),
            f"transform({_fold_single(j)}, "
            f"t -> named_struct('key', t.key, 'value', t.cnt))",
        )

    def kv_sum(i: int, j: int) -> str:
        return _hybrid(
            _kv_sum_filter(i, j),
            f"transform({_fold_single(j)}, "
            f"t -> named_struct('key', t.key, 'value', t.s{i}))",
        )

    def kkv(a: int, b: int) -> str:
        # pair keys: the OLD order was array_sort over (key1, key2)
        # structs — struct field comparison, which this sort reproduces
        # with the same struct comparator (pos appended only as the
        # uniqueness tiebreak; counts need no within-key order)
        elem = f"named_struct('k1', e.__k{a}, 'k2', e.__k{b}, 'pos', i)"
        sorted_arr = f"array_sort(transform(__rows, (e, i) -> {elem}))"
        out_t = "array<struct<key1:int,key2:int,value:double>>"
        acc0 = (
            f"named_struct('out', CAST(array() AS {out_t}), 'has', false, "
            f"'k1', CAST(NULL AS INT), 'k2', CAST(NULL AS INT), "
            f"'cnt', CAST(0.0 AS DOUBLE))"
        )
        entry = "named_struct('key1', acc.k1, 'key2', acc.k2, 'value', acc.cnt)"
        flush = f"IF(acc.has, concat(acc.out, array({entry})), acc.out)"
        same = (
            "named_struct('out', acc.out, 'has', true, 'k1', acc.k1, "
            "'k2', acc.k2, 'cnt', acc.cnt + CAST(1.0 AS DOUBLE))"
        )
        new = (
            f"named_struct('out', {flush}, 'has', true, 'k1', e.k1, "
            f"'k2', e.k2, 'cnt', CAST(0.0 AS DOUBLE) + CAST(1.0 AS DOUBLE))"
        )
        fold = (
            f"aggregate({sorted_arr}, {acc0}, "
            f"(acc, e) -> IF(acc.has AND (acc.k1 <=> e.k1) AND "
            f"(acc.k2 <=> e.k2), {same}, {new}), acc -> {flush})"
        )
        return _hybrid(_kkv_filter(a, b), fold)

    fields = [
        F.col("__n").alias("N"),
        (
            F.array(*[F.coalesce(F.col(f"__lin_{i}"), F.lit(0.0)) for i in range(d)])
            if d
            else F.expr("array()").cast("array<double>")
        ).alias("lin_agg"),
        (
            F.array(
                *[
                    F.coalesce(F.col(f"__quad_{p}"), F.lit(0.0))
                    for p in range(len(quad_idx))
                ]
            )
            if d
            else F.expr("array()").cast("array<double>")
        ).alias("quad_agg"),
        F.expr("array(" + ", ".join(kv_count(j) for j in range(c)) + ")").alias(
            "lin_cat"
        ),
    ]
    if not nb:
        fields += [
            (
                F.expr(
                    "array("
                    + ", ".join(kv_sum(i, j) for i in range(d) for j in range(c))
                    + ")"
                )
                if d
                else F.expr("array()").cast(f"array<{_KV_T}>")
            ).alias("quad_num_cat"),
            F.expr(
                "array(" + ", ".join(kkv(a, b) for (a, b) in cat_pairs(c)) + ")"
            ).alias("quad_cat"),
        ]
    out = g.select(*group_by, F.struct(*fields).alias(result_col))
    return out.drop("__g") if internal_key else out


def _sum_to_triple_pandas(
    df: DataFrame,
    num_cols: list[str],
    cat_cols: list[str],
    group_by: list[str],
    nb: bool = False,
    result_col: str = "triple",
) -> DataFrame:
    """Arrow ``applyInPandas`` fallback: one NumPy-computed triple per
    group.  This is the documented slow path for semantics the built-in
    operators can't express — kept as a third strategy so the declarative
    paths always have an independent implementation to diff against.
    Groups are pulled into Python whole, so use it only when every group
    fits in executor memory; NULL categorical keys are not supported here
    (the JVM strategies carry them)."""
    from collections import Counter

    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql.types import StructField, StructType

    from ..functions.triple import nb_schema, triple_schema

    d, c = len(num_cols), len(cat_cols)
    internal_key = not group_by
    if internal_key:
        df = df.withColumn("__g", F.lit(0))
        group_by = ["__g"]
    base = df.select(
        *group_by,
        *[F.col(x).cast("double").alias(f"__x{i}") for i, x in enumerate(num_cols)],
        *[F.col(x).cast("int").alias(f"__k{j}") for j, x in enumerate(cat_cols)],
    )
    group_fields = [base.schema[g] for g in group_by]
    t_schema = nb_schema() if nb else triple_schema()
    out_schema = StructType(group_fields + [StructField(result_col, t_schema)])
    pairs = cat_pairs(c)

    def fn(pdf):
        n = len(pdf)
        X = pdf[[f"__x{i}" for i in range(d)]].to_numpy(dtype=float) if d else None
        lin = X.sum(axis=0) if d else []
        if d:
            if nb:
                quad = (X * X).sum(axis=0)
            else:
                G = X.T @ X
                quad = [G[i, j] for i in range(d) for j in range(i, d)]
        else:
            quad = []
        K = (
            pdf[[f"__k{j}" for j in range(c)]].to_numpy(dtype="int64")
            if c
            else None
        )
        lin_cat = []
        for j in range(c):
            cnt = Counter(K[:, j].tolist())
            lin_cat.append(
                [{"key": int(k), "value": float(v)} for k, v in sorted(cnt.items())]
            )
        triple = {
            "N": int(n),
            "lin_agg": [float(v) for v in lin],
            "quad_agg": [float(v) for v in quad],
            "lin_cat": lin_cat,
        }
        if not nb:
            qnc = []
            for i in range(d):
                for j in range(c):
                    sums: dict = {}
                    for key, x in zip(K[:, j].tolist(), X[:, i].tolist()):
                        sums[key] = sums.get(key, 0.0) + x
                    qnc.append(
                        [{"key": int(k), "value": float(v)} for k, v in sorted(sums.items())]
                    )
            qcc = []
            for a, b in pairs:
                cnt = Counter(zip(K[:, a].tolist(), K[:, b].tolist()))
                qcc.append(
                    [
                        {"key1": int(k1), "key2": int(k2), "value": float(v)}
                        for (k1, k2), v in sorted(cnt.items())
                    ]
                )
            triple["quad_num_cat"] = qnc
            triple["quad_cat"] = qcc
        out = {g: [pdf[g].iloc[0]] for g in group_by}
        out[result_col] = [triple]
        import pandas as _pd

        return _pd.DataFrame(out)

    out = base.groupBy(*group_by).applyInPandas(fn, schema=out_schema)
    return out.drop("__g") if internal_key else out


def sum_to_triples_conditional(
    df: DataFrame,
    num_cols: Sequence[str],
    cat_cols: Sequence[str],
    conds: Sequence,
    nb: bool = False,
):
    """ONE scan, one triple per condition (a row may satisfy several
    conditions and contributes to each).

    Rows explode to one copy per satisfied condition tagged with its
    index, then the ordinary grouped cofactor aggregates per tag —
    within a partition each tag sees exactly the rows (in the same
    order) that ``df.filter(cond)`` would, so partial aggregates equal
    the per-filter form.  Built for driver loops that need several
    filtered cofactors of the SAME frame state (MICE ``low``: the
    post-rewrite delta of the current column and the pre-train delta of
    the next one) — halves the number of jobs without changing any
    value.

    Returns ``list[Triple]`` aligned with ``conds`` (zero triple for
    conditions matching no rows)."""
    from ..functions.triple import Triple

    tags = F.array(
        *[
            F.when(c, F.lit(i)).otherwise(F.lit(None).cast("int"))
            for i, c in enumerate(conds)
        ]
    )
    tagged = df.withColumn(
        "__cond", F.explode(F.filter(tags, lambda x: x.isNotNull()))
    )
    rows = {
        r["__cond"]: r["triple"]
        for r in sum_to_triple(
            tagged, num_cols, cat_cols, group_by=["__cond"], nb=nb
        ).collect()
    }
    d, c = len(num_cols), len(cat_cols)
    return [
        Triple.from_row(rows[i], d_num=d, d_cat=c)
        if i in rows
        else Triple.zero(d, c, nb=nb)
        for i in range(len(conds))
    ]
