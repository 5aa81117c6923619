"""Property laws for the driver-side ANN training kernels (numpy, no
Spark) — the centroids/codebooks these produce are baked as plan
constants into BOTH the Spark rows and their SQL oracles, so the
critical properties are determinism (same seed, same bits — the
shared-bits discipline the oracle factories rely on) and geometric
sanity (every centroid stays inside the data's coordinate-wise box:
centroids are means of subsets, or untouched samples)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from duckdb_imputation_spark.operators.simsearch import (
    kmeans_np,
    pq_train_np,
)

_mat = arrays(
    np.float64,
    st.tuples(st.integers(2, 24), st.sampled_from([2, 4, 8])),
    elements=st.floats(
        min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
    ),
)


@settings(max_examples=60, deadline=None)
@given(_mat, st.integers(1, 6), st.integers(0, 2**31 - 1))
def test_kmeans_deterministic_and_boxed(X, nlist, seed):
    a = kmeans_np(X.copy(), nlist, seed=seed)
    b = kmeans_np(X.copy(), nlist, seed=seed)
    assert a.shape == (min(nlist, len(X)), X.shape[1])
    assert np.array_equal(a, b), "seeded k-means must be bit-deterministic"
    lo, hi = X.min(axis=0), X.max(axis=0)
    eps = 1e-9 * (1.0 + np.abs([lo, hi]).max())
    assert (a >= lo - eps).all() and (a <= hi + eps).all(), (
        "centroids are means of subsets (or untouched samples) — "
        "they cannot leave the data's coordinate-wise box"
    )


@settings(max_examples=60, deadline=None)
@given(_mat, st.integers(0, 2**31 - 1))
def test_pq_codebooks_deterministic_and_boxed_per_subspace(X, seed):
    m = 2 if X.shape[1] == 2 else 2  # dim divides evenly
    ksub = 4
    a = pq_train_np(X.copy(), m=m, ksub=ksub, seed=seed)
    b = pq_train_np(X.copy(), m=m, ksub=ksub, seed=seed)
    dsub = X.shape[1] // m
    assert a.shape == (m, min(ksub, len(X)), dsub)
    assert np.array_equal(a, b)
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        lo, hi = sub.min(axis=0), sub.max(axis=0)
        eps = 1e-9 * (1.0 + np.abs([lo, hi]).max())
        assert (a[s] >= lo - eps).all() and (a[s] <= hi + eps).all()


@settings(max_examples=40, deadline=None)
@given(_mat, st.integers(1, 6))
def test_kmeans_single_point_and_duplicate_rows(X, nlist):
    """Degenerate inputs the sampler can hit at tiny SFs: all rows
    identical → every centroid equals that row."""
    Xdup = np.repeat(X[:1], len(X), axis=0)
    cent = kmeans_np(Xdup, nlist, seed=7)
    assert np.allclose(cent, X[0])