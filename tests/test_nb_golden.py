"""NB-aggregate variants vs the reference golden literals
(test_nb_sum.py, test_nb_mul.py) + ring-law property tests (hypothesis)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_imputation_spark.functions.triple import Triple
from duckdb_imputation_spark.operators.cofactor import sum_to_triple
from duckdb_imputation_spark.operators.multiply import multiply_triples

from test_triple_algebra import ROWS, agg

NB_GOLDEN_FULL = {'N': 5, 'lin_agg': [15.0, 17.0, 22.0], 'quad_agg': [59.0, 91.0, 112.0], 'lin_cat': [[{'key': 4, 'value': 3.0}, {'key': 8, 'value': 2.0}], [{'key': 5, 'value': 1.0}, {'key': 6, 'value': 2.0}, {'key': 9, 'value': 1.0}, {'key': 10, 'value': 1.0}], [{'key': 6, 'value': 1.0}, {'key': 8, 'value': 2.0}, {'key': 10, 'value': 1.0}, {'key': 12, 'value': 1.0}]]}  # noqa: E501
NB_GOLDEN_G1 = {'N': 2, 'lin_agg': [6.0, 8.0, 10.0], 'quad_agg': [26.0, 40.0, 58.0], 'lin_cat': [[{'key': 4, 'value': 1.0}, {'key': 8, 'value': 1.0}], [{'key': 5, 'value': 1.0}, {'key': 9, 'value': 1.0}], [{'key': 6, 'value': 1.0}, {'key': 10, 'value': 1.0}]]}  # noqa: E501
NB_GOLDEN_G2 = {'N': 3, 'lin_agg': [9.0, 9.0, 12.0], 'quad_agg': [33.0, 51.0, 54.0], 'lin_cat': [[{'key': 4, 'value': 2.0}, {'key': 8, 'value': 1.0}], [{'key': 6, 'value': 2.0}, {'key': 10, 'value': 1.0}], [{'key': 8, 'value': 2.0}, {'key': 12, 'value': 1.0}]]}  # noqa: E501
# multiply_nb_agg(A over gb=1 (b,c|d,e), B over gb=2 (a,c|d,f)) — cross join
NB_GOLDEN_MUL = {'N': 6, 'lin_agg': [24.0, 30.0, 18.0, 24.0], 'quad_agg': [120.0, 174.0, 66.0, 108.0], 'lin_cat': [[{'key': 4, 'value': 3.0}, {'key': 8, 'value': 3.0}], [{'key': 5, 'value': 3.0}, {'key': 9, 'value': 3.0}], [{'key': 4, 'value': 4.0}, {'key': 8, 'value': 2.0}], [{'key': 8, 'value': 4.0}, {'key': 12, 'value': 2.0}]]}  # noqa: E501


def test_nb_python_algebra_matches_golden():
    assert agg(ROWS, [1, 2, 3], [4, 5, 6], nb=True).to_dict() == NB_GOLDEN_FULL
    g1 = agg([r for r in ROWS if r[0] == 1], [1, 2, 3], [4, 5, 6], nb=True)
    g2 = agg([r for r in ROWS if r[0] == 2], [1, 2, 3], [4, 5, 6], nb=True)
    assert g1.to_dict() == NB_GOLDEN_G1
    assert g2.to_dict() == NB_GOLDEN_G2


def test_nb_mul_matches_golden():
    a = agg([r for r in ROWS if r[0] == 1], [2, 3], [4, 5], nb=True)
    b = agg([r for r in ROWS if r[0] == 2], [1, 3], [4, 6], nb=True)
    assert (a * b).to_dict() == NB_GOLDEN_MUL


def test_nb_spark_agg_matches_golden(ring_fixture):
    out = sum_to_triple(ring_fixture, ["a", "b", "c"], ["d", "e", "f"], nb=True)
    got = Triple.from_row(out.collect()[0]["triple"]).to_dict()
    assert got == NB_GOLDEN_FULL
    grouped = sum_to_triple(
        ring_fixture, ["a", "b", "c"], ["d", "e", "f"], group_by=["gb"], nb=True
    ).collect()
    got_g = {r["gb"]: Triple.from_row(r["triple"]).to_dict() for r in grouped}
    assert got_g == {1: NB_GOLDEN_G1, 2: NB_GOLDEN_G2}


def test_nb_spark_mul_matches_golden(ring_fixture):
    import pyspark.sql.functions as F

    a = sum_to_triple(ring_fixture.filter("gb=1"), ["b", "c"], ["d", "e"], nb=True, result_col="A")
    b = sum_to_triple(ring_fixture.filter("gb=2"), ["a", "c"], ["d", "f"], nb=True, result_col="B")
    out = a.crossJoin(b).select(
        multiply_triples(F.col("A"), F.col("B"), (2, 2), (2, 2), nb=True).alias("t")
    ).collect()
    assert Triple.from_row(out[0]["t"]).to_dict() == NB_GOLDEN_MUL


# ------------------------------------------------------- ring laws (PBT)

row_strategy = st.tuples(
    st.floats(-100, 100, allow_nan=False, width=32),
    st.floats(-100, 100, allow_nan=False, width=32),
    st.integers(0, 5),
    st.integers(0, 3),
)


def _agg_rows(rows, nb=False):
    t = Triple.zero(2, 2, nb=nb)
    for r in rows:
        t = t + Triple.lift([r[0], r[1]], [r[2], r[3]], nb=nb)
    return t


def _close(t1: Triple, t2: Triple, tol=1e-6):
    """Equality modulo exact-zero map residues (⊖ keeps zero-valued keys —
    PARITY.md deviation #8) and float tolerance."""
    assert t1.n == t2.n
    assert np.allclose(t1.lin, t2.lin, atol=tol)
    assert np.allclose(t1.quad, t2.quad, atol=tol)

    def nz(m):
        return {k: v for k, v in m.items() if abs(v) > tol}

    for m1, m2 in zip(
        t1.lin_cat + t1.quad_num_cat + t1.quad_cat,
        t2.lin_cat + t2.quad_num_cat + t2.quad_cat,
    ):
        a, b = nz(m1), nz(m2)
        assert set(a) == set(b)
        for k in a:
            assert abs(a[k] - b[k]) < max(tol, tol * abs(a[k]))


@settings(max_examples=50, deadline=None)
@given(st.lists(row_strategy, min_size=1, max_size=12), st.integers(1, 10))
def test_sum_partition_invariance(rows, split):
    """⊕ is associative+commutative: any partitioning aggregates equal —
    the property Spark's partial/final aggregation relies on."""
    split = split % len(rows) if rows else 0
    whole = _agg_rows(rows)
    parts = _agg_rows(rows[:split]) + _agg_rows(rows[split:]) if split else whole
    _close(whole, parts)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(row_strategy, min_size=1, max_size=6),
    st.lists(row_strategy, min_size=1, max_size=6),
)
def test_sub_inverts_add(rows_a, rows_b):
    a, b = _agg_rows(rows_a), _agg_rows(rows_b)
    back = (a + b) - b
    _close(back, a, tol=1e-4)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(row_strategy, min_size=1, max_size=5),
    st.lists(row_strategy, min_size=1, max_size=5),
    st.lists(row_strategy, min_size=1, max_size=5),
)
def test_mul_distributes_over_add(rows_a, rows_b, rows_c):
    """(a ⊕ b) ⊗ c == (a ⊗ c) ⊕ (b ⊗ c) — the factorized-join theorem's
    algebraic core."""
    a, b, c = _agg_rows(rows_a), _agg_rows(rows_b), _agg_rows(rows_c)
    left = (a + b) * c
    right = (a * c) + (b * c)
    _close(left, right, tol=1e-3)


@settings(max_examples=30, deadline=None)
@given(st.lists(row_strategy, min_size=1, max_size=8))
def test_mul_with_one_is_scaling(rows):
    """t ⊗ 1-row-of-nothing == t with N-scaling semantics: the empty-shape
    triple with N=k acts as a scalar k."""
    t = _agg_rows(rows)
    one = Triple.zero(0, 0)
    one.n = 3
    scaled = t * one
    assert scaled.n == 3 * t.n
    assert np.allclose(scaled.lin, 3 * t.lin)
    assert np.allclose(scaled.quad, 3 * t.quad)
