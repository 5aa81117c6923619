"""PCA: distributed Gram statistics, eigen model, Column-expr projection.

The catalog row pins cross-engine projection parity; these tests pin the
DISTRIBUTED training path (mapInPandas partial Gram matrices) against
plain numpy, and the model against sklearn-style properties
(orthonormality, variance ordering, reconstruction)."""

import numpy as np
import pytest

from duckdb_imputation_spark.operators.pca import (
    gram_stats,
    pca_np,
    pca_project,
    pca_train,
)


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(5)
    # anisotropic: variance concentrated in two known directions
    base = rng.normal(size=(200, 2)) @ np.array([[5.0, 0, 0, 0, 0, 0],
                                                 [0, 2.0, 0, 0, 0, 0]])
    X = base + rng.normal(scale=0.1, size=(200, 6)) + np.array([1, 2, 3, 4, 5, 6])
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    return df, X


def test_gram_stats_exact(spark, data):
    df, X = data
    n, s, G = gram_stats(df, "embedding")
    assert n == len(X)
    np.testing.assert_allclose(s, X.sum(0), rtol=1e-12)
    np.testing.assert_allclose(G, X.T @ X, rtol=1e-12)


def test_gram_stats_skips_nulls(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    n, s, G = gram_stats(df, "embedding")
    assert n == 2
    np.testing.assert_allclose(s, [4.0, 6.0])


def test_pca_train_matches_numpy_svd(spark, data):
    df, X = data
    model = pca_train(df, "embedding", k=3)
    Xc = X - X.mean(0)
    # numpy reference: eigvecs of the sample covariance
    w, v = np.linalg.eigh(np.cov(Xc.T))
    order = np.argsort(w)[::-1][:3]
    for j in range(3):
        ref = v[:, order[j]]
        got = model.components[j]
        # same axis up to sign
        assert abs(abs(np.dot(ref, got)) - 1.0) < 1e-9
    np.testing.assert_allclose(
        model.explained_variance, np.sort(w)[::-1][:3], rtol=1e-9
    )
    # components orthonormal, variance descending, sign convention
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(3), atol=1e-9
    )
    assert (np.diff(model.explained_variance) <= 1e-12).all()
    for row in model.components:
        assert row[np.argmax(np.abs(row))] > 0


def test_projection_matches_numpy(spark, data):
    df, X = data
    model = pca_train(df, "embedding", k=2)
    got = {
        r["vec_id"]: (r["pc0"], r["pc1"])
        for r in pca_project(df, "embedding", model).collect()
    }
    ref = (X - model.mean) @ model.components.T
    for i in range(len(X)):
        np.testing.assert_allclose(got[i], ref[i], rtol=1e-9, atol=1e-9)


def test_uncentered_mode():
    X = np.array([[1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    model = pca_np(3, X.sum(0), X.T @ X, k=1, center=False)
    np.testing.assert_allclose(model.mean, [0.0, 0.0])
    np.testing.assert_allclose(np.abs(model.components[0]), [1.0, 0.0], atol=1e-12)


def test_projection_is_jvm_side(spark, data):
    df, _ = data
    model = pca_train(df, "embedding", k=2)
    out = pca_project(df, "embedding", model)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # project path must stay codegen'd: no Python eval of any kind
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_ann_pca_topk_recall_anisotropic(spark):
    """On data with real principal structure (variance concentrated in
    6 of 32 dims) the 6-dim shortlist + exact rerank recovers the
    brute-force top-k.  PCA-ANN is exactly as good as the spectrum —
    the isotropic-testdata case is covered by the k'=d test below."""
    from duckdb_imputation_spark.operators.pca import pca_train
    from duckdb_imputation_spark.operators.simsearch import ann_pca_topk, cosine_topk

    rng = np.random.default_rng(9)
    X = np.zeros((300, 32))
    X[:, :6] = rng.normal(scale=5.0, size=(300, 6))
    X += rng.normal(scale=0.05, size=(300, 32))
    df = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    model = pca_train(df, "embedding", k=6)
    q = [float(x) for x in X[0] + 0.01]
    brute = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    got = [r["vec_id"] for r in ann_pca_topk(df, q, model, k=10, rerank=4).collect()]
    assert len(set(brute) & set(got)) / 10 >= 0.8
    # surviving ids carry the EXACT cosine score (rerank is full-dim)
    bs = {r["vec_id"]: r["score"] for r in cosine_topk(df, q, k=10).collect()}
    gs = {r["vec_id"]: r["score"] for r in ann_pca_topk(df, q, model, k=10).collect()}
    for i in set(bs) & set(gs):
        assert bs[i] == gs[i]


def test_ann_pca_topk_full_rank_is_exact(spark):
    """k' = d keeps the full space: the shortlist ordering equals exact
    dot ordering, so the result IS the brute-force top-k — on the real
    (isotropic, unit-norm) testdata embeddings."""
    from duckdb_imputation_spark.operators.pca import pca_train
    from duckdb_imputation_spark.operators.simsearch import ann_pca_topk, cosine_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # uncentered: a full orthonormal basis preserves raw dot products
    # exactly (centering would shift scores by a per-vector x.mean term)
    model = pca_train(df, "embedding", k=64, center=False)
    q = [0.1] * 64
    brute = [(r["vec_id"], r["score"]) for r in cosine_topk(df, q, k=10).collect()]
    got = [
        (r["vec_id"], r["score"])
        for r in ann_pca_topk(df, q, model, k=10, rerank=2).collect()
    ]
    assert got == brute


def test_pca_save_load_roundtrip(spark, data, tmp_path):
    from duckdb_imputation_spark.operators.pca import pca_load, pca_save

    df, _ = data
    model = pca_train(df, "embedding", k=3)
    path = str(tmp_path / "pca_model")
    pca_save(spark, model, path)
    back = pca_load(spark, path)
    np.testing.assert_array_equal(back.mean, model.mean)
    np.testing.assert_array_equal(back.components, model.components)
    np.testing.assert_array_equal(back.explained_variance, model.explained_variance)
    a = pca_project(df, "embedding", model).select("pc0").collect()
    b = pca_project(df, "embedding", back).select("pc0").collect()
    assert [r.pc0 for r in a] == [r.pc0 for r in b]
