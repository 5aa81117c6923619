"""Ring ⊗ — factorized aggregation over joins.

Spark-first re-expression of the reference's ``multiply_triple`` scalar
function (duckdb_extension/src/triple/mul.cpp:19-611) and the
``sum_triple(multiply_triple(A,B)) FROM ... JOIN ... ON key`` pattern
(README.md:163-174, LMFAO/F-IVM lineage).

Catalyst does not rewrite agg-over-join into partial-agg ⊗ on its own
(SURVEY §4), so this is exposed as an explicit API:

* :func:`multiply_triples` — the ⊗ of two triple struct columns, as a pure
  Column expression (JVM-side higher-order functions, no Python UDF): the
  product triple spans the concatenated column spaces, with
  N = N₁N₂, lin = lin₁·N₂ ∥ lin₂·N₁, quad cross-blocks lin₁ᵢ·lin₂ⱼ, cat
  maps scaled by the other side's N, and the cat×cat cross block a full
  key cross product (mul.cpp:564-580).
* :func:`triple_over_join` — the end-to-end factorized pattern: group each
  side by the join key, aggregate *locally* to one triple per key, join
  the (tiny) grouped results, ⊗, then ⊕.  At 100 TB this is the whole
  point: the join operates on |distinct keys| rows instead of the raw
  fact tables, and each side's heavy aggregation shuffles only once on
  its own key.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.triple import cat_pairs, n_quad, pair_index
from .cofactor import lift_columns, sum_to_triple, sum_triples

__all__ = ["multiply_triples", "multiply_flatten_entries", "triple_over_join"]


def _scale_kv(arr: Column, factor: Column) -> Column:
    return F.transform(
        arr,
        lambda e: F.struct(
            e["key"].alias("key"), (e["value"] * factor).alias("value")
        ),
    )


def _scale_kkv(arr: Column, factor: Column) -> Column:
    return F.transform(
        arr,
        lambda e: F.struct(
            e["key1"].alias("key1"),
            e["key2"].alias("key2"),
            (e["value"] * factor).alias("value"),
        ),
    )


def _kv_times_scalar(arr: Column, scalar: Column) -> Column:
    """{key -> v} * x  →  {key -> v*x} (num×cat cross block)."""
    return _scale_kv(arr, scalar)


def _kv_cross(arr_a: Column, arr_b: Column) -> Column:
    """Full key cross product {k1 -> v1} ⊗ {k2 -> v2} → {(k1,k2) -> v1*v2}."""
    return F.flatten(
        F.transform(
            arr_a,
            lambda x: F.transform(
                arr_b,
                lambda y: F.struct(
                    x["key"].alias("key1"),
                    y["key"].alias("key2"),
                    (x["value"] * y["value"]).alias("value"),
                ),
            ),
        )
    )


def multiply_triples(
    left: Column,
    right: Column,
    shape_left: tuple[int, int],
    shape_right: tuple[int, int],
    nb: bool = False,
) -> Column:
    """⊗ of two triple struct columns → product triple struct column.

    ``shape_* = (d_num, d_cat)``.  Shapes are compile-time (they determine
    the output struct), mirroring the reference's bind-time return-type
    computation (mul.cpp:614-650).
    """
    d1, c1 = shape_left
    d2, c2 = shape_right
    d, c = d1 + d2, c1 + c2
    a, b = left, right
    na = a["N"].cast("double")
    nb_ = b["N"].cast("double")

    def a_lin(i: int) -> Column:
        return F.element_at(a["lin_agg"], i + 1)

    def b_lin(i: int) -> Column:
        return F.element_at(b["lin_agg"], i + 1)

    lin = F.concat(
        F.transform(a["lin_agg"], lambda x: x * nb_),
        F.transform(b["lin_agg"], lambda x: x * na),
    )

    if nb:
        quad = F.concat(
            F.transform(a["quad_agg"], lambda x: x * nb_),
            F.transform(b["quad_agg"], lambda x: x * na),
        )
    else:
        quad_items = []
        for i in range(d):
            for j in range(i, d):
                if j < d1:
                    quad_items.append(
                        F.element_at(a["quad_agg"], pair_index(i, j, d1) + 1) * nb_
                    )
                elif i >= d1:
                    quad_items.append(
                        F.element_at(b["quad_agg"], pair_index(i - d1, j - d1, d2) + 1)
                        * na
                    )
                else:
                    quad_items.append(a_lin(i) * b_lin(j - d1))
        quad = (
            F.array(*quad_items)
            if quad_items
            else F.expr("array()").cast("array<double>")
        )

    lin_cat_items = [
        _scale_kv(F.element_at(a["lin_cat"], j + 1), nb_) for j in range(c1)
    ] + [_scale_kv(F.element_at(b["lin_cat"], j + 1), na) for j in range(c2)]
    lin_cat = (
        F.array(*lin_cat_items)
        if lin_cat_items
        else F.expr("array()").cast("array<array<struct<key:int,value:double>>>")
    )

    fields = [
        (a["N"] * b["N"]).alias("N"),
        lin.alias("lin_agg"),
        quad.alias("quad_agg"),
        lin_cat.alias("lin_cat"),
    ]
    if nb:
        return F.struct(*fields)

    qnc_items = []
    for i in range(d):
        for j in range(c):
            if i < d1 and j < c1:
                qnc_items.append(
                    _scale_kv(F.element_at(a["quad_num_cat"], i * c1 + j + 1), nb_)
                )
            elif i >= d1 and j >= c1:
                qnc_items.append(
                    _scale_kv(
                        F.element_at(
                            b["quad_num_cat"], (i - d1) * c2 + (j - c1) + 1
                        ),
                        na,
                    )
                )
            elif i < d1:  # num from A × cat from B
                qnc_items.append(
                    _kv_times_scalar(F.element_at(b["lin_cat"], j - c1 + 1), a_lin(i))
                )
            else:  # num from B × cat from A
                qnc_items.append(
                    _kv_times_scalar(F.element_at(a["lin_cat"], j + 1), b_lin(i - d1))
                )
    quad_num_cat = (
        F.array(*qnc_items)
        if qnc_items
        else F.expr("array()").cast("array<array<struct<key:int,value:double>>>")
    )

    qcc_items = []
    for x, y in cat_pairs(c):
        if y < c1:
            qcc_items.append(
                _scale_kkv(F.element_at(a["quad_cat"], pair_index(x, y, c1) + 1), nb_)
            )
        elif x >= c1:
            qcc_items.append(
                _scale_kkv(
                    F.element_at(b["quad_cat"], pair_index(x - c1, y - c1, c2) + 1),
                    na,
                )
            )
        else:
            qcc_items.append(
                F.sort_array(
                    _kv_cross(
                        F.element_at(a["lin_cat"], x + 1),
                        F.element_at(b["lin_cat"], y - c1 + 1),
                    )
                )
            )
    quad_cat = (
        F.array(*qcc_items)
        if qcc_items
        else F.expr("array()").cast(
            "array<array<struct<key1:int,key2:int,value:double>>>"
        )
    )

    fields += [quad_num_cat.alias("quad_num_cat"), quad_cat.alias("quad_cat")]
    return F.struct(*fields)


def _flat_entry(
    part: str, i: int, j: int, k1: Column, k2: Column, val: Column
) -> Column:
    """One flat statistic entry struct — field-for-field the layout
    :func:`~.flatten.flatten_triple` emits."""
    return F.struct(
        F.lit(part).alias("part"),
        F.lit(i).cast("int").alias("i"),
        F.lit(j).cast("int").alias("j"),
        k1.cast("int").alias("k1"),
        k2.cast("int").alias("k2"),
        val.cast("double").alias("val"),
    )


def multiply_flatten_entries(
    left: Column,
    right: Column,
    shape_left: tuple[int, int],
    shape_right: tuple[int, int],
    nb: bool = False,
) -> Column:
    """Flat entry rows of the ⊗ product, fused (r14, guide §1.2): the
    array :func:`~.flatten.flatten_triple` would generate from
    ``multiply_triples(left, right)``, with each slot's product
    expression inlined directly into its entry struct — the
    intermediate nested product struct (13+ array allocations per
    joined key for the (1,1)x(1,1) shape, walked again by the
    generator) is never built.

    Element-for-element identical to flatten(multiply(...)), in the
    same emission order: every slot below computes the same arithmetic
    as the corresponding :func:`multiply_triples` block (scalar slots
    read the same element_at positions; map slots compose the scale
    into the entry transform; the cat×cat cross block keeps the same
    sort so even within-row emission order is unchanged).  Feed to
    ``F.inline`` and sum with one grouped aggregation."""
    d1, c1 = shape_left
    d2, c2 = shape_right
    d, c = d1 + d2, c1 + c2
    a, b = left, right
    na = a["N"].cast("double")
    nb_ = b["N"].cast("double")

    def a_lin(i: int) -> Column:
        return F.element_at(a["lin_agg"], i + 1)

    def b_lin(i: int) -> Column:
        return F.element_at(b["lin_agg"], i + 1)

    arrays = [F.array(_flat_entry("N", -1, -1, F.lit(-1), F.lit(-1), a["N"] * b["N"]))]
    for i in range(d):
        val = a_lin(i) * nb_ if i < d1 else b_lin(i - d1) * na
        arrays.append(
            F.array(_flat_entry("lin", i, -1, F.lit(-1), F.lit(-1), val))
        )
    quad_pairs = [(i, i) for i in range(d)] if nb else [
        (i, j) for i in range(d) for j in range(i, d)
    ]
    for i, j in quad_pairs:
        if nb:
            # nb quad slots are the diagonal in storage order (slot p =
            # pair (p, p)); sides scale like lin
            val = (
                F.element_at(a["quad_agg"], i + 1) * nb_
                if i < d1
                else F.element_at(b["quad_agg"], i - d1 + 1) * na
            )
        elif j < d1:
            val = F.element_at(a["quad_agg"], pair_index(i, j, d1) + 1) * nb_
        elif i >= d1:
            val = (
                F.element_at(b["quad_agg"], pair_index(i - d1, j - d1, d2) + 1)
                * na
            )
        else:
            val = a_lin(i) * b_lin(j - d1)
        arrays.append(
            F.array(_flat_entry("quad", i, j, F.lit(-1), F.lit(-1), val))
        )

    def kv_entries(part: str, i: int, j: int, arr: Column, factor: Column) -> Column:
        return F.transform(
            arr,
            lambda e: _flat_entry(
                part, i, j, e["key"], F.lit(-1), e["value"] * factor
            ),
        )

    for j in range(c):
        arrays.append(
            kv_entries("lin_cat", j, -1, F.element_at(a["lin_cat"], j + 1), nb_)
            if j < c1
            else kv_entries(
                "lin_cat", j, -1, F.element_at(b["lin_cat"], j - c1 + 1), na
            )
        )
    if nb:
        return F.concat(*arrays)

    for i in range(d):
        for j in range(c):
            if i < d1 and j < c1:
                e = kv_entries(
                    "quad_num_cat", i, j,
                    F.element_at(a["quad_num_cat"], i * c1 + j + 1), nb_,
                )
            elif i >= d1 and j >= c1:
                e = kv_entries(
                    "quad_num_cat", i, j,
                    F.element_at(
                        b["quad_num_cat"], (i - d1) * c2 + (j - c1) + 1
                    ),
                    na,
                )
            elif i < d1:  # num from A × cat from B
                e = kv_entries(
                    "quad_num_cat", i, j,
                    F.element_at(b["lin_cat"], j - c1 + 1), a_lin(i),
                )
            else:  # num from B × cat from A
                e = kv_entries(
                    "quad_num_cat", i, j,
                    F.element_at(a["lin_cat"], j + 1), b_lin(i - d1),
                )
            arrays.append(e)

    def kkv_entries(x: int, y: int, arr: Column, factor: Column) -> Column:
        return F.transform(
            arr,
            lambda e: _flat_entry(
                "quad_cat", x, y, e["key1"], e["key2"], e["value"] * factor
            ),
        )

    for x, y in cat_pairs(c):
        if y < c1:
            arrays.append(
                kkv_entries(
                    x, y,
                    F.element_at(a["quad_cat"], pair_index(x, y, c1) + 1),
                    nb_,
                )
            )
        elif x >= c1:
            arrays.append(
                kkv_entries(
                    x, y,
                    F.element_at(
                        b["quad_cat"], pair_index(x - c1, y - c1, c2) + 1
                    ),
                    na,
                )
            )
        else:
            # cat from A × cat from B: full key cross product; the sort
            # keeps the exact emission order of the unfused path (the
            # entry prefix (part,i,j) is constant, so ordering by the
            # entry equals the old sort_array over (key1,key2,value))
            arrays.append(
                F.sort_array(
                    F.flatten(
                        F.transform(
                            F.element_at(a["lin_cat"], x + 1),
                            lambda e1: F.transform(
                                F.element_at(b["lin_cat"], y - c1 + 1),
                                lambda e2: _flat_entry(
                                    "quad_cat", x, y,
                                    e1["key"], e2["key"],
                                    e1["value"] * e2["value"],
                                ),
                            ),
                        )
                    )
                )
            )
    return F.concat(*arrays)


def triple_over_join(
    df1: DataFrame,
    df2: DataFrame,
    on: str | Sequence[str],
    num1: Sequence[str],
    cat1: Sequence[str] = (),
    num2: Sequence[str] = (),
    cat2: Sequence[str] = (),
    nb: bool = False,
    keep_key: bool = False,
    broadcast_right: bool = False,
    group_by: Sequence[str] = (),
    result_col: str = "triple",
    null_safe_keys: bool = False,
    unique_right: bool = False,
    flat_entries: bool = False,
) -> DataFrame:
    """Factorized cofactor over an equi-join (README.md:166-174):

        sum_triple( multiply_triple(g1.t, g2.t) )
        FROM (SELECT key, sum_to_triple(...) FROM df1 GROUP BY key) g1
        JOIN (SELECT key, sum_to_triple(...) FROM df2 GROUP BY key) g2
        USING key

    Each fact table is aggregated *before* the join, so the join touches
    one row per key per side.  ``broadcast_right=True`` hints the grouped
    right side to broadcast (correct when |distinct keys| is dim-sized).
    With ``keep_key=True`` returns one product triple per key (skips the
    final ⊕); ``group_by`` (columns of df1, e.g. a coarser key) yields one
    summed triple per group — the reference's ``GROUP BY gb`` over the
    join (README.md:166-172).

    Join keys follow SQL inner-join semantics (NULL keys never match),
    matching the reference's ``JOIN ... ON a = b``.  Pass
    ``null_safe_keys=True`` for ``<=>`` matching; the default plain
    equality also plans measurably faster (the null-safe comparison
    blocks Catalyst's isnotnull inference and key-exchange reuse —
    ~1.7× on the sf0.1 factorized-join benchmark).

    ``unique_right=True`` — callers MUST guarantee BOTH preconditions,
    the operator cannot check them for free (ADVICE r13):

    1. the right join key is UNIQUE in ``df2`` (a primary key): the
       lift replaces a per-key aggregate, so a duplicated key would
       silently multiply every statistic by extra join matches;
    2. every ``num2``/``cat2`` feature is NON-NULL: the lift carries a
       NULL through the product triple where the aggregate's sum
       treated it as absent (0-contribution).

    Vetted call sites (orders PK, non-null month/status features):
    ``queries.triple_factorized_join`` and
    ``queries.triple_factorized_join_grouped``.  Set the
    ``SPARK_GRAFT_DEBUG_UNIQUE`` env var (or pass debug asserts via
    tests) to make a violated key-uniqueness precondition fail loudly:
    it runs one count-vs-distinct-count aggregate over ``df2`` before
    planning the lift.

    ``flat_entries=True`` returns the final ⊕ as FLAT entry rows
    (``group_by..., part, i, j, k1, k2, val`` — see
    :func:`~.cofactor.sum_triples`); incompatible with ``keep_key``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    group_by = list(group_by)
    # join keys are (near-)unique → tiny groups → the collect strategy
    # (one shuffle per side instead of three); pass strategy="twolevel"
    # through sum_to_triple directly if your key is low-cardinality
    g1 = sum_to_triple(
        df1,
        num1,
        cat1,
        group_by=keys + group_by,
        nb=nb,
        result_col="__t1",
        strategy="collect" if cat1 else "twolevel",
    )
    if keep_key and flat_entries:
        raise ValueError("flat_entries applies to the final ⊕; not with keep_key")
    if unique_right:
        # r13: when the right side's join key is UNIQUE (a primary key —
        # the caller's assertion), every group has exactly one row and
        # its cofactor IS the per-row lift, so the grouped aggregate
        # (one shuffle + per-group map assembly) is replaced by a pure
        # projection (guide §2.4: remove the shuffle outright; measured
        # 0.61 s → 0.12 s on the sf0.1 orders side).  Caveat: lift does
        # not skip NULL feature values the way an aggregate's sum does —
        # callers opt in only for non-null features on a key-unique side
        # (preconditions + vetted call sites: see docstring).
        if os.environ.get("SPARK_GRAFT_DEBUG_UNIQUE"):
            # debug-mode loud failure for a violated caller assertion
            # (VERDICT r13 wrong #2) — one extra aggregate job, so it is
            # opt-in, never part of the production plan
            n_rows, n_keys = df2.select(
                F.count(F.lit(1)),
                F.count_distinct(*[F.col(k) for k in keys]),
            ).first()
            if n_rows != n_keys:
                raise ValueError(
                    f"unique_right=True but the right join key is not "
                    f"unique: {n_rows} rows vs {n_keys} distinct "
                    f"{keys} values"
                )
        g2 = df2.select(
            *keys, lift_columns(num2, cat2, nb=nb).alias("__t2")
        )
    else:
        g2 = sum_to_triple(
            df2,
            num2,
            cat2,
            group_by=keys,
            nb=nb,
            result_col="__t2",
            strategy="collect" if cat2 else "twolevel",
        )
    g2 = g2.withColumnsRenamed({k: f"__rhs_{k}" for k in keys})
    if broadcast_right:
        g2 = F.broadcast(g2)
    cond = None
    for k in keys:
        lhs, rhs = F.col(k), F.col(f"__rhs_{k}")
        c = lhs.eqNullSafe(rhs) if null_safe_keys else lhs == rhs
        cond = c if cond is None else cond & c
    joined = g1.join(g2, cond, "inner").drop(*[f"__rhs_{k}" for k in keys])
    if flat_entries:
        # fused ⊗+flatten (r14, guide §1.2): generate the flat product
        # entries straight off (__t1, __t2) — the nested product struct
        # is never built — then ONE grouped sum.  Element-for-element
        # (values AND emission order) identical to
        # flatten(multiply_triples(...)), see multiply_flatten_entries.
        entries = joined.select(
            *group_by,
            F.inline(
                multiply_flatten_entries(
                    F.col("__t1"),
                    F.col("__t2"),
                    (len(num1), len(cat1)),
                    (len(num2), len(cat2)),
                    nb=nb,
                )
            ),
        )
        return entries.groupBy(*group_by, "part", "i", "j", "k1", "k2").agg(
            F.sum("val").alias("val")
        )
    prod = joined.select(
        *keys,
        *group_by,
        multiply_triples(
            F.col("__t1"),
            F.col("__t2"),
            (len(num1), len(cat1)),
            (len(num2), len(cat2)),
            nb=nb,
        ).alias(result_col),
    )
    if keep_key:
        return prod
    return sum_triples(
        prod,
        result_col,
        len(num1) + len(num2),
        len(cat1) + len(cat2),
        group_by=group_by,
        nb=nb,
        result_col=result_col,
    )
