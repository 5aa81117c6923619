"""Driver-side ring algebra vs the reference golden literals
(duckdb_extension/test/python/test_sum.py, test_mul.py, test_lift.py)."""

import numpy as np
import pytest

from duckdb_imputation_spark.functions.triple import Triple, n_quad, pair_index

# The reference fixture (test_sum.py:15-16): (gb, a, b, c, d, e, f)
ROWS = [
    (1, 1.0, 2.0, 3.0, 4, 5, 6),
    (1, 5.0, 6.0, 7.0, 8, 9, 10),
    (2, 2.0, 1.0, 3.0, 4, 6, 8),
    (2, 5.0, 7.0, 6.0, 8, 10, 12),
    (2, 2.0, 1.0, 3.0, 4, 6, 8),
]


def agg(rows, num_idx, cat_idx, nb=False):
    t = None
    for r in rows:
        lifted = Triple.lift([r[i] for i in num_idx], [r[i] for i in cat_idx], nb=nb)
        t = lifted if t is None else t + lifted
    return t


GOLDEN_FULL = {'N': 5, 'lin_agg': [15.0, 17.0, 22.0], 'quad_agg': [59.0, 71.0, 80.0, 91.0, 96.0, 112.0], 'lin_cat': [[{'key': 4, 'value': 3.0}, {'key': 8, 'value': 2.0}], [{'key': 5, 'value': 1.0}, {'key': 6, 'value': 2.0}, {'key': 9, 'value': 1.0}, {'key': 10, 'value': 1.0}], [{'key': 6, 'value': 1.0}, {'key': 8, 'value': 2.0}, {'key': 10, 'value': 1.0}, {'key': 12, 'value': 1.0}]], 'quad_num_cat': [[{'key': 4, 'value': 5.0}, {'key': 8, 'value': 10.0}], [{'key': 5, 'value': 1.0}, {'key': 6, 'value': 4.0}, {'key': 9, 'value': 5.0}, {'key': 10, 'value': 5.0}], [{'key': 6, 'value': 1.0}, {'key': 8, 'value': 4.0}, {'key': 10, 'value': 5.0}, {'key': 12, 'value': 5.0}], [{'key': 4, 'value': 4.0}, {'key': 8, 'value': 13.0}], [{'key': 5, 'value': 2.0}, {'key': 6, 'value': 2.0}, {'key': 9, 'value': 6.0}, {'key': 10, 'value': 7.0}], [{'key': 6, 'value': 2.0}, {'key': 8, 'value': 2.0}, {'key': 10, 'value': 6.0}, {'key': 12, 'value': 7.0}], [{'key': 4, 'value': 9.0}, {'key': 8, 'value': 13.0}], [{'key': 5, 'value': 3.0}, {'key': 6, 'value': 6.0}, {'key': 9, 'value': 7.0}, {'key': 10, 'value': 6.0}], [{'key': 6, 'value': 3.0}, {'key': 8, 'value': 6.0}, {'key': 10, 'value': 7.0}, {'key': 12, 'value': 6.0}]], 'quad_cat': [[{'key1': 4, 'key2': 4, 'value': 3.0}, {'key1': 8, 'key2': 8, 'value': 2.0}], [{'key1': 4, 'key2': 5, 'value': 1.0}, {'key1': 4, 'key2': 6, 'value': 2.0}, {'key1': 8, 'key2': 9, 'value': 1.0}, {'key1': 8, 'key2': 10, 'value': 1.0}], [{'key1': 4, 'key2': 6, 'value': 1.0}, {'key1': 4, 'key2': 8, 'value': 2.0}, {'key1': 8, 'key2': 10, 'value': 1.0}, {'key1': 8, 'key2': 12, 'value': 1.0}], [{'key1': 5, 'key2': 5, 'value': 1.0}, {'key1': 6, 'key2': 6, 'value': 2.0}, {'key1': 9, 'key2': 9, 'value': 1.0}, {'key1': 10, 'key2': 10, 'value': 1.0}], [{'key1': 5, 'key2': 6, 'value': 1.0}, {'key1': 6, 'key2': 8, 'value': 2.0}, {'key1': 9, 'key2': 10, 'value': 1.0}, {'key1': 10, 'key2': 12, 'value': 1.0}], [{'key1': 6, 'key2': 6, 'value': 1.0}, {'key1': 8, 'key2': 8, 'value': 2.0}, {'key1': 10, 'key2': 10, 'value': 1.0}, {'key1': 12, 'key2': 12, 'value': 1.0}]]}  # noqa: E501


def test_pair_index_roundtrip():
    d = 5
    seen = set()
    for i in range(d):
        for j in range(i, d):
            seen.add(pair_index(i, j, d))
    assert seen == set(range(n_quad(d)))
    assert pair_index(3, 1, d) == pair_index(1, 3, d)


def test_lift_and_sum_matches_reference_golden():
    t = agg(ROWS, [1, 2, 3], [4, 5, 6])
    assert t.to_dict() == GOLDEN_FULL


def test_sub_roundtrip():
    t_all = agg(ROWS, [1, 2, 3], [4, 5, 6])
    t_g1 = agg([r for r in ROWS if r[0] == 1], [1, 2, 3], [4, 5, 6])
    t_g2 = agg([r for r in ROWS if r[0] == 2], [1, 2, 3], [4, 5, 6])
    diff = t_all - t_g1
    assert diff.n == t_g2.n
    assert np.allclose(diff.lin, t_g2.lin)
    assert np.allclose(diff.quad, t_g2.quad)
    # map keys may keep exact-zero residues after ⊖; compare non-zero content
    for m1, m2 in zip(diff.lin_cat, t_g2.lin_cat):
        assert {k: v for k, v in m1.items() if v != 0} == m2
    for m1, m2 in zip(diff.quad_cat, t_g2.quad_cat):
        assert {k: v for k, v in m1.items() if v != 0} == m2


# multiply golden (test_mul.py equi-join variant, res[0] == gb=1 pair)
GOLDEN_MUL_GB1 = {'N': 4, 'lin_agg': [16.0, 20.0, 12.0, 20.0], 'quad_agg': [80.0, 96.0, 48.0, 80.0, 116.0, 60.0, 100.0, 52.0, 76.0, 116.0], 'lin_cat': [[{'key': 4, 'value': 2.0}, {'key': 8, 'value': 2.0}], [{'key': 5, 'value': 2.0}, {'key': 9, 'value': 2.0}], [{'key': 4, 'value': 2.0}, {'key': 8, 'value': 2.0}], [{'key': 6, 'value': 2.0}, {'key': 10, 'value': 2.0}]], 'quad_num_cat': [[{'key': 4, 'value': 4.0}, {'key': 8, 'value': 12.0}], [{'key': 5, 'value': 4.0}, {'key': 9, 'value': 12.0}], [{'key': 4, 'value': 8.0}, {'key': 8, 'value': 8.0}], [{'key': 6, 'value': 8.0}, {'key': 10, 'value': 8.0}], [{'key': 4, 'value': 6.0}, {'key': 8, 'value': 14.0}], [{'key': 5, 'value': 6.0}, {'key': 9, 'value': 14.0}], [{'key': 4, 'value': 10.0}, {'key': 8, 'value': 10.0}], [{'key': 6, 'value': 10.0}, {'key': 10, 'value': 10.0}], [{'key': 4, 'value': 6.0}, {'key': 8, 'value': 6.0}], [{'key': 5, 'value': 6.0}, {'key': 9, 'value': 6.0}], [{'key': 4, 'value': 2.0}, {'key': 8, 'value': 10.0}], [{'key': 6, 'value': 2.0}, {'key': 10, 'value': 10.0}], [{'key': 4, 'value': 10.0}, {'key': 8, 'value': 10.0}], [{'key': 5, 'value': 10.0}, {'key': 9, 'value': 10.0}], [{'key': 4, 'value': 6.0}, {'key': 8, 'value': 14.0}], [{'key': 6, 'value': 6.0}, {'key': 10, 'value': 14.0}]], 'quad_cat': [[{'key1': 4, 'key2': 4, 'value': 2.0}, {'key1': 8, 'key2': 8, 'value': 2.0}], [{'key1': 4, 'key2': 5, 'value': 2.0}, {'key1': 8, 'key2': 9, 'value': 2.0}], [{'key1': 4, 'key2': 4, 'value': 1.0}, {'key1': 4, 'key2': 8, 'value': 1.0}, {'key1': 8, 'key2': 4, 'value': 1.0}, {'key1': 8, 'key2': 8, 'value': 1.0}], [{'key1': 4, 'key2': 6, 'value': 1.0}, {'key1': 4, 'key2': 10, 'value': 1.0}, {'key1': 8, 'key2': 6, 'value': 1.0}, {'key1': 8, 'key2': 10, 'value': 1.0}], [{'key1': 5, 'key2': 5, 'value': 2.0}, {'key1': 9, 'key2': 9, 'value': 2.0}], [{'key1': 5, 'key2': 4, 'value': 1.0}, {'key1': 5, 'key2': 8, 'value': 1.0}, {'key1': 9, 'key2': 4, 'value': 1.0}, {'key1': 9, 'key2': 8, 'value': 1.0}], [{'key1': 5, 'key2': 6, 'value': 1.0}, {'key1': 5, 'key2': 10, 'value': 1.0}, {'key1': 9, 'key2': 6, 'value': 1.0}, {'key1': 9, 'key2': 10, 'value': 1.0}], [{'key1': 4, 'key2': 4, 'value': 2.0}, {'key1': 8, 'key2': 8, 'value': 2.0}], [{'key1': 4, 'key2': 6, 'value': 2.0}, {'key1': 8, 'key2': 10, 'value': 2.0}], [{'key1': 6, 'key2': 6, 'value': 2.0}, {'key1': 10, 'key2': 10, 'value': 2.0}]]}  # noqa: E501


def test_multiply_matches_reference_golden():
    g1 = [r for r in ROWS if r[0] == 1]
    A = agg(g1, [2, 3], [4, 5])  # sum_to_triple_2_2(b,c,d,e) where gb=1
    B = agg(g1, [1, 3], [4, 6])  # sum_to_triple_2_2(a,c,d,f) where gb=1
    assert (A * B).to_dict() == GOLDEN_MUL_GB1


def test_multiply_nb():
    g1 = [r for r in ROWS if r[0] == 1]
    A = agg(g1, [2, 3], [4], nb=True)
    B = agg(g1, [1], [6], nb=True)
    m = A * B
    assert m.n == A.n * B.n
    assert np.allclose(m.lin, [16.0, 20.0, 12.0])
    # diagonal quads scale by the other side's N
    assert np.allclose(m.quad, list(A.quad * B.n) + list(B.quad * A.n))
    assert m.lin_cat[0] == {4: 2.0, 8: 2.0}
    assert m.lin_cat[1] == {6: 2.0, 10: 2.0}


def test_lift_golden_row0():
    t = Triple.lift([1.0, 2.0, 3.0], [4, 5, 6])
    expect = {'N': 1, 'lin_num': [1.0, 2.0, 3.0], 'quad_num': [1.0, 2.0, 3.0, 4.0, 6.0, 9.0], 'lin_cat': [[{'key': 4, 'value': 1.0}], [{'key': 5, 'value': 1.0}], [{'key': 6, 'value': 1.0}]], 'quad_num_cat': [[{'key': 4, 'value': 1.0}], [{'key': 5, 'value': 1.0}], [{'key': 6, 'value': 1.0}], [{'key': 4, 'value': 2.0}], [{'key': 5, 'value': 2.0}], [{'key': 6, 'value': 2.0}], [{'key': 4, 'value': 3.0}], [{'key': 5, 'value': 3.0}], [{'key': 6, 'value': 3.0}]], 'quad_cat': [[{'key1': 4, 'key2': 4, 'value': 1.0}], [{'key1': 4, 'key2': 5, 'value': 1.0}], [{'key1': 4, 'key2': 6, 'value': 1.0}], [{'key1': 5, 'key2': 5, 'value': 1.0}], [{'key1': 5, 'key2': 6, 'value': 1.0}], [{'key1': 6, 'key2': 6, 'value': 1.0}]]}  # noqa: E501
    assert t.to_dict(lin_name="lin_num", quad_name="quad_num") == expect


def test_nb_lift_diag_only():
    t = Triple.lift([2.0, 3.0], [7], nb=True)
    d = t.to_dict()
    assert d["quad_agg"] == [4.0, 9.0]
    assert "quad_cat" not in d


def test_from_row_roundtrip():
    t = agg(ROWS, [1, 2, 3], [4, 5, 6])
    t2 = Triple.from_row(t.to_dict())
    assert t2.to_dict() == t.to_dict()
    tnb = agg(ROWS, [1], [4], nb=True)
    tnb2 = Triple.from_row(tnb.to_dict())
    assert tnb2.nb and tnb2.to_dict() == tnb.to_dict()
