"""Property-based laws for the Triple ring algebra (hypothesis fuzz over
the driver-side ⊕ ⊖ ⊗ that the MICE delta path and the factorized join
ride) — the golden-literal tests pin specific values from the
reference's own fixtures; these pin the ALGEBRA for arbitrary small
integer-valued inputs, where float addition is exact so every law can
be asserted with == rather than a tolerance:

* ⊕ is commutative and associative, with Triple.zero as identity;
* ⊖ inverts ⊕ exactly on integer grids — the delta-cofactor contract
  (remove a partition's contribution, get the remainder's cofactor);
* Σlift(A ∪ B) = Σlift(A) ⊕ Σlift(B) (lift-sum linearity);
* the FACTORIZATION LAW: Σlift(A × B) = Σlift(A) ⊗ Σlift(B), where
  A × B is the cross join with concatenated num/cat columns — the
  single identity that makes agg-over-join factorizable (reference
  mul.cpp:19-611); checked for the full triple AND the NB diagonal
  variant.

Pure driver-side (no SparkSession) — milliseconds per example."""

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_imputation_spark.functions.triple import Triple

# small integer-valued floats: addition/multiplication exact in float64
_val = st.integers(-5, 5).map(float)
_key = st.integers(0, 3)


def _rows(d_num, d_cat, max_rows=4):
    row = st.tuples(
        st.lists(_val, min_size=d_num, max_size=d_num),
        st.lists(_key, min_size=d_cat, max_size=d_cat),
    )
    return st.lists(row, min_size=0, max_size=max_rows)


@st.composite
def _shaped(draw, sides=1, nb=False, nonempty=False):
    """(d_num, d_cat, rows...) with per-side independent shapes for ⊗."""
    out = []
    for _ in range(sides):
        d_num = draw(st.integers(0, 2 if sides > 1 else 3))
        d_cat = draw(st.integers(0, 2))
        rows = draw(_rows(d_num, d_cat))
        if nonempty and not rows:
            rows = draw(_rows(d_num, d_cat, max_rows=3).filter(len))
        out.append((d_num, d_cat, rows))
    return out[0] if sides == 1 else out


def _sum_lift(rows, d_num, d_cat, nb=False) -> Triple:
    t = Triple.zero(d_num, d_cat, nb=nb)
    for nums, cats in rows:
        t = t + Triple.lift(nums, cats, nb=nb)
    return t


def _canon(d: dict) -> dict:
    """Value-level canonical form: drop categorical entries whose value
    is exactly 0.0.  ⊖ leaves explicit {key: 0.0} tombstones where a
    contribution cancelled (the fuzz found this on its first run —
    documented in Triple.__sub__); every consumer folds by VALUE, where
    an explicit 0.0 and an absent key are the same number, so the laws
    are asserted under this canonicalization."""
    out = {}
    for k, v in d.items():
        if k in ("lin_cat", "quad_num_cat"):
            out[k] = [
                [e for e in grp if e["value"] != 0.0] for grp in v
            ]
        elif k == "quad_cat":
            out[k] = [
                [e for e in grp if e["value"] != 0.0] for grp in v
            ]
        else:
            out[k] = v
    return out


@settings(max_examples=150, deadline=None)
@given(_shaped(), st.booleans())
def test_add_commutative_and_zero_identity(shape, nb):
    d, c, rows = shape
    half = len(rows) // 2
    a = _sum_lift(rows[:half], d, c, nb=nb)
    b = _sum_lift(rows[half:], d, c, nb=nb)
    assert (a + b).to_dict() == (b + a).to_dict()
    z = Triple.zero(d, c, nb=nb)
    assert (a + z).to_dict() == a.to_dict()
    assert (z + a).to_dict() == a.to_dict()


@settings(max_examples=150, deadline=None)
@given(_shaped(), st.booleans())
def test_add_associative_on_integer_grids(shape, nb):
    d, c, rows = shape
    k = max(1, len(rows) // 3)
    a = _sum_lift(rows[:k], d, c, nb=nb)
    b = _sum_lift(rows[k : 2 * k], d, c, nb=nb)
    cc = _sum_lift(rows[2 * k :], d, c, nb=nb)
    assert ((a + b) + cc).to_dict() == (a + (b + cc)).to_dict()


@settings(max_examples=150, deadline=None)
@given(_shaped(), st.booleans())
def test_sub_inverts_add_exactly(shape, nb):
    """The MICE delta contract: fold a partition in with ⊕, take it back
    out with ⊖, land exactly on the remainder's cofactor — including
    the dict-keyed categorical blocks, where a key whose value returns
    to 0.0 must compare equal to the never-added state."""
    d, c, rows = shape
    half = len(rows) // 2
    a = _sum_lift(rows[:half], d, c, nb=nb)
    b = _sum_lift(rows[half:], d, c, nb=nb)
    assert _canon(((a + b) - b).to_dict()) == _canon(a.to_dict())
    assert _canon(((a + b) - a).to_dict()) == _canon(b.to_dict())
    # and the raw (uncanonicalized) numeric blocks are exactly equal —
    # only the categorical DICT representation may carry 0.0 tombstones
    assert ((a + b) - b).to_dict()["lin_agg"] == a.to_dict()["lin_agg"]
    assert ((a + b) - b).to_dict()["quad_agg"] == a.to_dict()["quad_agg"]


@settings(max_examples=150, deadline=None)
@given(_shaped(), st.booleans())
def test_lift_sum_linearity(shape, nb):
    d, c, rows = shape
    half = len(rows) // 2
    whole = _sum_lift(rows, d, c, nb=nb)
    parts = _sum_lift(rows[:half], d, c, nb=nb) + _sum_lift(
        rows[half:], d, c, nb=nb
    )
    assert whole.to_dict() == parts.to_dict()


@settings(max_examples=100, deadline=None)
@given(_shaped(sides=2, nonempty=True), st.booleans())
def test_factorization_law(shapes, nb):
    """Σlift(A × B) == Σlift(A) ⊗ Σlift(B): the agg-over-join identity.
    The left side lifts every cross-joined row (concatenated num/cat
    spaces) and folds with ⊕; the right side aggregates each relation
    independently and multiplies once — the factorized plan.  Integer
    grids make both sides exact, so the comparison is ==."""
    (d1, c1, rows_a), (d2, c2, rows_b) = shapes
    cross = [
        (list(na) + list(nb_), list(ka) + list(kb))
        for na, ka in rows_a
        for nb_, kb in rows_b
    ]
    lhs = _sum_lift(cross, d1 + d2, c1 + c2, nb=nb)
    rhs = _sum_lift(rows_a, d1, c1, nb=nb) * _sum_lift(
        rows_b, d2, c2, nb=nb
    )
    assert lhs.to_dict() == rhs.to_dict()


@settings(max_examples=100, deadline=None)
@given(_shaped(sides=2, nonempty=True))
def test_factorization_with_empty_side(shapes):
    """An EMPTY relation annihilates the product (N = 0, every block
    zero) exactly as an empty cross join does."""
    (d1, c1, rows_a), (d2, c2, _) = shapes
    empty = Triple.zero(d2, c2)
    rhs = _sum_lift(rows_a, d1, c1) * empty
    lhs = Triple.zero(d1 + d2, c1 + c2)
    assert rhs.n == 0
    assert rhs.to_dict()["N"] == lhs.to_dict()["N"]
    assert rhs.to_dict()["lin_agg"] == lhs.to_dict()["lin_agg"]
    assert rhs.to_dict()["quad_agg"] == lhs.to_dict()["quad_agg"]


@settings(max_examples=150, deadline=None)
@given(_shaped(), st.booleans())
def test_to_dict_from_row_round_trip(shape, nb):
    """from_row(to_dict(t)) reproduces t exactly — the serialization
    boundary the MICE driver path crosses every iteration (Spark Row →
    driver Triple → delta algebra).  to_dict's key-sorted nested shape
    is exactly the triple_schema Row shape, so the dict stands in for
    the Row here."""
    d, c, rows = shape
    t = _sum_lift(rows, d, c, nb=nb)
    back = Triple.from_row(t.to_dict(), d_num=d, d_cat=c)
    assert back.nb == nb
    assert back.to_dict() == t.to_dict()


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 12))
def test_pair_index_is_a_bijection(d):
    """pair_index maps the upper triangle (i <= j) bijectively onto
    [0, d(d+1)/2) in the reference's row-major layout, and is symmetric
    in its arguments — the indexing every quad block and sigma assembly
    rides (reference ML/utils.cpp:196-199)."""
    from duckdb_imputation_spark.functions.triple import (
        cat_pairs,
        n_quad,
        pair_index,
    )

    seen = [pair_index(i, j, d) for i in range(d) for j in range(i, d)]
    assert sorted(seen) == list(range(n_quad(d)))
    # symmetric and consistent with cat_pairs' enumeration order
    assert all(
        pair_index(j, i, d) == pair_index(i, j, d)
        for i in range(d)
        for j in range(i, d)
    )
    assert [pair_index(a, b, d) for a, b in cat_pairs(d)] == list(
        range(n_quad(d))
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=64,
    )
)
def test_quantize_int8_bounds_and_scale_cancellation(vec):
    """quantize_int8_py laws: every code is an int8 value (|q| <= 127),
    reconstruction error is within half a scale step per axis, the max
    |x| axis maps to exactly ±127, and the all-zero vector maps to all
    zeros — the invariants the quantized-cosine score's error bound
    (~1/127 per axis) is derived from."""
    from duckdb_imputation_spark.operators.simsearch import quantize_int8_py

    q = quantize_int8_py(vec)
    amax = max(abs(x) for x in vec)
    raw_scale = amax / 127.0
    scale = raw_scale if raw_scale > 0 else 1.0
    assert all(abs(c) <= 127 for c in q)
    assert all(
        abs(x - c * scale) <= scale / 2 + 1e-9 * max(1.0, abs(x))
        for x, c in zip(vec, q)
    )
    if raw_scale > 0:
        imax = max(range(len(vec)), key=lambda i: abs(vec[i]))
        assert abs(q[imax]) == 127
    else:
        # all-zero OR subnormal-amax (amax/127 underflows to 0.0 — the
        # fuzz-found edge): all-zero codes, the dropped-norm-0 class
        assert all(c == 0 for c in q)
