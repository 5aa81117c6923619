"""ML train/predict vs NumPy oracles computed directly from raw data.

The central identity: the sigma matrix built from a triple must equal
Zᵀ Z of the one-hot design matrix Z = [1 | nums | one-hot cats] — then
every model's training math can be checked against direct computation
(no sklearn in this environment; np.linalg is the same LAPACK the
reference links)."""

import math

import numpy as np
import pytest

from duckdb_imputation_spark.functions.triple import Triple
from duckdb_imputation_spark.ml import (
    build_sigma,
    lda_train,
    linreg_train,
    nb_train,
    one_hot_dictionary,
    qda_train,
)

RNG = np.random.default_rng(42)


def make_rows(n=300, n_classes=3):
    """Rows: (y, x1, x2, cat_feat, cls) — y linear in x's + cat effect."""
    cls = RNG.integers(0, n_classes, n)
    x1 = RNG.normal(0, 1, n) + cls * 2.0
    x2 = RNG.normal(0, 1, n) - cls * 1.0
    cat_feat = RNG.integers(10, 13, n)  # values 10,11,12
    effect = {10: 0.0, 11: 2.5, 12: -1.0}
    y = 3.0 + 2.0 * x1 - 1.5 * x2 + np.array([effect[c] for c in cat_feat])
    y = y + RNG.normal(0, 0.01, n)
    return [
        (float(y[i]), float(x1[i]), float(x2[i]), int(cat_feat[i]), int(cls[i]))
        for i in range(n)
    ]


def triple_of(rows, num_idx, cat_idx, nb=False):
    t = None
    for r in rows:
        lifted = Triple.lift([r[i] for i in num_idx], [r[i] for i in cat_idx], nb=nb)
        t = lifted if t is None else t + lifted
    return t


def design(rows, num_idx, cat_idx, cat_dicts):
    """Z = [1 | nums | one-hot cats] with sorted per-column dictionaries."""
    Z = []
    for r in rows:
        row = [1.0] + [float(r[i]) for i in num_idx]
        for j, ci in enumerate(cat_idx):
            row += [1.0 if r[ci] == k else 0.0 for k in cat_dicts[j]]
        Z.append(row)
    return np.array(Z)


@pytest.fixture(scope="module")
def data():
    rows = make_rows()
    t = triple_of(rows, [0, 1, 2], [3, 4])
    return rows, t


def test_sigma_equals_gram_matrix(data):
    rows, t = data
    cat_idxs, cat_array = one_hot_dictionary([t])
    sigma = build_sigma(t, cat_idxs, cat_array)
    dicts = [cat_array[cat_idxs[j] : cat_idxs[j + 1]] for j in range(2)]
    Z = design(rows, [0, 1, 2], [3, 4], dicts)
    assert np.allclose(sigma, Z.T @ Z, rtol=1e-9, atol=1e-6)


def test_sigma_label_excluded(data):
    rows, t = data
    cat_idxs, cat_array = one_hot_dictionary([t])
    sigma = build_sigma(t, cat_idxs, cat_array, label_cat=1)
    dicts = [cat_array[cat_idxs[0] : cat_idxs[1]]]
    Z = design(rows, [0, 1, 2], [3], dicts)
    assert np.allclose(sigma, Z.T @ Z, rtol=1e-9, atol=1e-6)


def test_linreg_closed_matches_pinv_oracle(data):
    rows, t = data
    model = linreg_train(t, label=0, method="closed")
    cat_idxs, cat_array = one_hot_dictionary([t])
    dicts = [cat_array[cat_idxs[j] : cat_idxs[j + 1]] for j in range(2)]
    Zf = design(rows, [1, 2], [3, 4], dicts)
    y = np.array([r[0] for r in rows])
    w = np.linalg.pinv(Zf) @ y
    got = np.array([model.intercept] + model.coef_num
                   + [v for m in model.coef_cat for _, v in sorted(m.items())])
    assert np.allclose(got, w, atol=1e-5)


def test_linreg_bgd_agrees_with_closed(data):
    rows, _ = data
    t = triple_of(rows, [0, 1, 2], [])  # numeric-only, well-conditioned
    closed = linreg_train(t, label=0, lambda_=1e-3, method="closed")
    bgd = linreg_train(
        t, label=0, step_size=1e-3, lambda_=1e-3, max_iter=20000, method="bgd"
    )
    pred_c = np.array([closed.intercept + closed.coef_num[0] * r[1] + closed.coef_num[1] * r[2] for r in rows])
    pred_b = np.array([bgd.intercept + bgd.coef_num[0] * r[1] + bgd.coef_num[1] * r[2] for r in rows])
    assert np.allclose(pred_c, pred_b, atol=1e-2)


def test_linreg_normalize_same_predictions(data):
    rows, _ = data
    t = triple_of(rows, [0, 1, 2], [])
    raw = linreg_train(t, label=0, method="closed")
    norm = linreg_train(t, label=0, method="closed", normalize=True)
    for r in rows[:20]:
        p1 = raw.intercept + raw.coef_num[0] * r[1] + raw.coef_num[1] * r[2]
        p2 = norm.intercept + norm.coef_num[0] * r[1] + norm.coef_num[1] * r[2]
        assert abs(p1 - p2) < 1e-6


def test_linreg_variance(data):
    rows, _ = data
    t = triple_of(rows, [0, 1, 2], [])
    m = linreg_train(t, label=0, compute_variance=True, method="closed")
    resid = []
    for r in rows:
        resid.append(r[0] - (m.intercept + m.coef_num[0] * r[1] + m.coef_num[1] * r[2]))
    assert m.std == pytest.approx(np.sqrt(np.mean(np.square(resid))), rel=1e-6)


def _lda_oracle(rows, num_idx, feat_cat_idx, label_idx, cat_dicts, shrinkage=0.0):
    Z = design(rows, num_idx, feat_cat_idx, cat_dicts)[:, 1:]  # no intercept col
    y = np.array([r[label_idx] for r in rows])
    classes = np.unique(y)
    p = Z.shape[1]
    S = np.zeros((p, p))
    M = np.zeros((p, len(classes)))
    for k, cval in enumerate(classes):
        Zc = Z[y == cval]
        mu = Zc.mean(axis=0)
        M[:, k] = mu
        S += (Zc - mu).T @ (Zc - mu)
    mu_tr = np.trace(S) / p
    S = S * (1 - shrinkage)
    S[np.diag_indices(p)] += shrinkage * mu_tr
    S /= len(rows)
    coef, *_ = np.linalg.lstsq(S, M, rcond=-1)
    icpt = [
        -0.5 * M[:, k] @ coef[:, k] + math.log((y == cval).mean())
        for k, cval in enumerate(classes)
    ]
    return classes, coef, np.array(icpt)


def test_lda_matches_direct_oracle(data):
    rows, t = data
    model = lda_train(t, label=1)  # class = cat col index 1 (cls)
    cat_idxs, cat_array = one_hot_dictionary([t])
    dicts = [cat_array[cat_idxs[0] : cat_idxs[1]]]
    classes, coef, icpt = _lda_oracle(rows, [0, 1, 2], [3], 4, dicts)
    assert model.class_keys == [int(c) for c in classes]
    got_coef = np.array(
        [
            model.coef_num[k]
            + [v for _, v in sorted(model.coef_cat[k][0].items())]
            for k in range(len(classes))
        ]
    ).T
    assert np.allclose(got_coef, coef, atol=1e-6)
    assert np.allclose(model.intercept, icpt, atol=1e-6)


def test_lda_normalize_same_predictions(data):
    """normalize=True must yield the same argmax predictions as raw
    training: coefficients rescaled to raw space and the mean-centering
    folded into the intercepts (ADVICE r1 — the centering term was
    dropped, shifting scores by a class-dependent constant)."""
    rows, t = data

    def predict(model, r):
        best, best_s = None, -math.inf
        for k in range(len(model.class_keys)):
            s = model.intercept[k]
            s += model.coef_num[k][0] * r[0]
            s += model.coef_num[k][1] * r[1]
            s += model.coef_num[k][2] * r[2]
            s += model.coef_cat[k][0].get(int(r[3]), 0.0)
            if s > best_s:
                best, best_s = model.class_keys[k], s
        return best

    raw = lda_train(t, label=1)
    norm = lda_train(t, label=1, normalize=True)
    for r in rows[:100]:
        assert predict(raw, r) == predict(norm, r), r


def test_lda_shrinkage(data):
    rows, t = data
    model = lda_train(t, label=1, shrinkage=0.3)
    cat_idxs, cat_array = one_hot_dictionary([t])
    dicts = [cat_array[cat_idxs[0] : cat_idxs[1]]]
    classes, coef, icpt = _lda_oracle(rows, [0, 1, 2], [3], 4, dicts, shrinkage=0.3)
    got_coef = np.array(
        [
            model.coef_num[k]
            + [v for _, v in sorted(model.coef_cat[k][0].items())]
            for k in range(len(classes))
        ]
    ).T
    assert np.allclose(got_coef, coef, atol=1e-6)
    assert np.allclose(model.intercept, icpt, atol=1e-6)


def test_qda_separates_classes():
    n = 400
    cls0 = RNG.multivariate_normal([0, 0], [[1.0, 0.3], [0.3, 0.5]], n)
    cls1 = RNG.multivariate_normal([3, 3], [[0.5, -0.2], [-0.2, 1.5]], n)
    rows0 = [(float(a), float(b)) for a, b in cls0]
    rows1 = [(float(a), float(b)) for a, b in cls1]
    t0 = triple_of(rows0, [0, 1], [])
    t1 = triple_of(rows1, [0, 1], [])
    model = qda_train([t0, t1], labels=[0, 1])

    def score(x, k):
        x = np.asarray(x)
        return x @ model.quad[k] @ x + model.lin[k] @ x + model.intercept[k]

    correct = sum(score(r, 0) > score(r, 1) for r in rows0)
    correct += sum(score(r, 1) > score(r, 0) for r in rows1)
    assert correct / (2 * n) > 0.95
    # covariance inverse sanity: -2*quad ≈ inv(cov of class 0)
    cov0 = np.cov(cls0.T, bias=True)
    assert np.allclose(-2 * model.quad[0], np.linalg.inv(cov0), atol=1e-6)


def test_nb_params_match_direct():
    rows = make_rows(400)
    classes = sorted({r[4] for r in rows})
    triples = [
        triple_of([r for r in rows if r[4] == c], [0, 1, 2], [3], nb=True)
        for c in classes
    ]
    model = nb_train(triples, labels=classes)
    for k, c in enumerate(classes):
        sub = [r for r in rows if r[4] == c]
        assert model.prior[k] == pytest.approx(len(sub) / len(rows))
        xs = np.array([r[1] for r in sub])
        assert model.mean[k][1] == pytest.approx(xs.mean(), rel=1e-9)
        assert model.var[k][1] == pytest.approx(xs.var(), rel=1e-6)
        f10 = sum(1 for r in sub if r[3] == 10) / len(sub)
        assert model.freq[k][0].get(10, 0.0) == pytest.approx(f10)


# ---- Spark predict expressions match driver-side math -----------------


def test_predict_exprs_on_spark(spark):
    rows = make_rows(200)
    df = spark.createDataFrame(
        rows, "y double, x1 double, x2 double, catf int, cls int"
    )
    t = triple_of(rows, [0, 1, 2], [3, 4])

    lr = linreg_train(t, label=0, compute_variance=True)
    out = df.withColumn(
        "pred", lr.predict_expr(["x1", "x2"], ["catf", "cls"])
    ).collect()
    cat_idxs, cat_array = one_hot_dictionary([t])
    for r in out[:50]:
        exp = (
            lr.intercept
            + lr.coef_num[0] * r["x1"]
            + lr.coef_num[1] * r["x2"]
            + lr.coef_cat[0][r["catf"]]
            + lr.coef_cat[1][r["cls"]]
        )
        assert r["pred"] == pytest.approx(exp, rel=1e-9)

    # stochastic: noise is seed-reproducible
    p1 = df.withColumn("p", lr.predict_expr(["x1", "x2"], ["catf", "cls"], add_noise=True, seed=7)).collect()
    p2 = df.withColumn("p", lr.predict_expr(["x1", "x2"], ["catf", "cls"], add_noise=True, seed=7)).collect()
    assert [r["p"] for r in p1] == [r["p"] for r in p2]

    lda = lda_train(t, label=1)
    got = df.withColumn("pred", lda.predict_expr(["y", "x1", "x2"], ["catf"])).collect()
    acc = np.mean([r["pred"] == r["cls"] for r in got])
    assert acc > 0.8  # classes are well separated in x1/x2

    classes = sorted({r[4] for r in rows})
    nb_triples = [
        triple_of([r for r in rows if r[4] == c], [1, 2], [3], nb=True)
        for c in classes
    ]
    nbm = nb_train(nb_triples, labels=classes)
    got = df.withColumn("pred", nbm.predict_expr(["x1", "x2"], ["catf"])).collect()
    acc = np.mean([r["pred"] == r["cls"] for r in got])
    assert acc > 0.8

    qda_triples = [
        triple_of([r for r in rows if r[4] == c], [1, 2], [3]) for c in classes
    ]
    qdam = qda_train(qda_triples, labels=classes)
    got = df.withColumn("pred", qdam.predict_expr(["x1", "x2"], ["catf"])).collect()
    acc = np.mean([r["pred"] == r["cls"] for r in got])
    assert acc > 0.8


def test_linreg_params_blob_roundtrip(data):
    rows, t = data
    m = linreg_train(t, label=0, compute_variance=True)
    blob = m.to_params_blob()
    # layout header: n_cat, then 3 idxs (2 cat cols + 1), then dictionary
    assert blob[0] == 2.0
    assert blob[1:4] == [0.0, 3.0, 6.0]  # catf has 3 values, cls has 3
    from duckdb_imputation_spark.ml.linreg import LinRegModel

    back = LinRegModel.from_params_blob(blob, n_num_features=2, has_std=True)
    assert back.intercept == pytest.approx(m.intercept)
    assert back.coef_num == pytest.approx(m.coef_num)
    assert back.coef_cat == m.coef_cat
    assert back.std == pytest.approx(m.std)


def test_ml_edge_cases(data):
    rows, _ = data
    # constant column: closed-form must not blow up (lstsq min-norm)
    t = triple_of([(r[0], r[1], 1.0) for r in rows], [0, 1, 2], [])
    m = linreg_train(t, label=0, method="closed")
    assert np.isfinite(m.intercept) and all(np.isfinite(c) for c in m.coef_num)
    # label out of range
    with pytest.raises(ValueError, match="out of range"):
        linreg_train(t, label=5)
    # LDA with a single class: coef solve degenerates but stays finite
    one_cls = [(r[0], r[1], r[2], r[3], 0) for r in rows[:50]]
    t1 = triple_of(one_cls, [0, 1, 2], [3, 4])
    lm = lda_train(t1, label=1)
    assert lm.class_keys == [0]
    assert all(np.isfinite(v) for v in lm.intercept)


def test_lda_params_blob_layout(data):
    rows, t = data
    m = lda_train(t, label=1)
    blob = m.to_params_blob()
    K = len(m.class_keys)
    assert blob[0] == float(K)
    assert blob[1] == 2.0  # one feature cat col -> size_idxs = 2
    assert blob[2:4] == [0.0, 3.0]  # catf has 3 values
    assert blob[4:7] == [10.0, 11.0, 12.0]  # dictionary
    assert blob[7 : 7 + K] == [float(k) for k in m.class_keys]
    p = 3 + 3  # 3 nums + 3 one-hots
    coefs = blob[7 + K : 7 + K + K * p]
    assert coefs[:3] == [pytest.approx(x) for x in m.coef_num[0]]
    assert blob[-K:] == [pytest.approx(b) for b in m.intercept]


def test_nb_params_blob_layout():
    rows = make_rows(200)
    classes = sorted({r[4] for r in rows})
    triples = [
        triple_of([r for r in rows if r[4] == c], [1, 2], [3], nb=True)
        for c in classes
    ]
    m = nb_train(triples, labels=classes)
    blob = m.to_params_blob()
    K = len(classes)
    assert blob[0] == float(K)
    assert blob[1] == 2.0  # 1 cat col -> n_cat+1
    assert blob[2:4] == [0.0, 3.0]
    assert blob[4:7] == [10.0, 11.0, 12.0]
    assert blob[7 : 7 + K] == [float(c) for c in classes]
    priors = blob[7 + K : 7 + 2 * K]
    assert sum(priors) == pytest.approx(1.0)
    # class 0 block: (mean,var) x2 nums then 3 freq slots
    block = blob[7 + 2 * K : 7 + 2 * K + 7]
    assert block[0] == pytest.approx(m.mean[0][0])
    assert block[3] == pytest.approx(m.var[0][1])
    assert sum(block[4:7]) == pytest.approx(1.0)  # frequencies sum to 1


def test_qda_params_blob_layout():
    """Reference FLOAT[] layout (qda.cpp:67-109 header, 252-293 blocks):
    [K, 0 (no cats), labels, then per class m*m quad | m lin | intercept]."""
    rows = make_rows(300)
    classes = sorted({r[4] for r in rows})
    triples = [
        triple_of([r for r in rows if r[4] == c], [0, 1, 2], []) for c in classes
    ]
    m_model = qda_train(triples, labels=classes)
    blob = m_model.to_params_blob()
    K, m = len(classes), 3
    assert blob[0] == float(K)
    assert blob[1] == 0.0  # numeric-only: no cat header
    assert blob[2 : 2 + K] == [float(c) for c in classes]
    assert len(blob) == 2 + K + K * (m * m + m + 1)
    for k in range(K):
        base = 2 + K + k * (m * m + m + 1)
        quad = np.asarray(blob[base : base + m * m]).reshape(m, m)
        assert np.allclose(quad, m_model.quad[k], atol=1e-12)
        assert blob[base + m * m : base + m * m + m] == [
            pytest.approx(x) for x in m_model.lin[k]
        ]
        assert blob[base + m * m + m] == pytest.approx(m_model.intercept[k])


def test_qda_normalized_blob_reference_semantics():
    """normalize=True blob (qda.cpp:245-251, 269-271, 298-301): per-class
    std-folded z-space params + the m pooled means appended.  Scoring the
    blob the way the reference's predict does — center raw features by
    the appended means, then xᵀQx + Lx + b — must reproduce the raw-space
    model's argmax (and, up to float noise, its score differences)."""
    rows = make_rows(300)
    classes = sorted({r[4] for r in rows})
    triples = [
        triple_of([r for r in rows if r[4] == c], [0, 1, 2], []) for c in classes
    ]
    raw = qda_train(triples, labels=classes, normalize=False)
    norm = qda_train(triples, labels=classes, normalize=True)
    blob = norm.to_params_blob()
    K, m = len(classes), 3
    assert len(blob) == 2 + K + K * (m * m + m + 1) + m  # + means tail
    means = np.asarray(blob[-m:])
    assert np.allclose(means, norm.norm_means)
    for r in rows[:40]:
        x = np.asarray(r[:3], dtype=float)
        z = x - means  # reference predict: subtract appended means
        scores_blob, scores_raw = [], []
        for k in range(K):
            base = 2 + K + k * (m * m + m + 1)
            Q = np.asarray(blob[base : base + m * m]).reshape(m, m)
            L = np.asarray(blob[base + m * m : base + m * m + m])
            b = blob[base + m * m + m]
            scores_blob.append(z @ Q @ z + L @ z + b)
            scores_raw.append(
                x @ raw.quad[k] @ x + raw.lin[k] @ x + raw.intercept[k]
            )
        assert int(np.argmax(scores_blob)) == int(np.argmax(scores_raw))
        d_blob = np.asarray(scores_blob) - scores_blob[0]
        d_raw = np.asarray(scores_raw) - scores_raw[0]
        assert np.allclose(d_blob, d_raw, rtol=1e-6, atol=1e-6)


def test_qda_blob_layout_with_cats():
    rows = make_rows(300)
    classes = sorted({r[4] for r in rows})
    triples = [
        triple_of([r for r in rows if r[4] == c], [0, 1], [3]) for c in classes
    ]
    m_model = qda_train(triples, labels=classes)
    blob = m_model.to_params_blob()
    c = 1
    assert blob[0] == float(len(classes))
    assert blob[1] == float(c + 1)
    n_keys = m_model.cat_idxs[-1]
    assert blob[2 : 2 + c + 1] == [float(x) for x in m_model.cat_idxs]
    assert blob[3 + c : 3 + c + n_keys] == [float(k) for k in m_model.cat_array]


def test_qda_sql_scorer_matches_pandas_udf(spark):
    """The shared-dialect SQL quadratic scorer (used by the catalog query
    for cross-engine exactness) must agree with the pandas-UDF scorer
    (the generic API)."""
    from duckdb_imputation_spark.ml.sql_twin import qda_predict_sql
    from pyspark.sql import functions as F

    rows = make_rows(400)
    classes = sorted({r[4] for r in rows})
    triples = [
        triple_of([r for r in rows if r[4] == c], [0, 1, 2], []) for c in classes
    ]
    model = qda_train(triples, labels=classes)
    df = spark.createDataFrame(
        rows, "y double, x1 double, x2 double, catf int, cls int"
    )
    out = df.withColumn(
        "p_udf", model.predict_expr(["y", "x1", "x2"], [])
    ).withColumn("p_sql", F.expr(qda_predict_sql(model, ["y", "x1", "x2"])))
    diff = out.filter(F.col("p_udf") != F.col("p_sql")).count()
    assert diff == 0


def test_qda_normalize_same_predictions():
    """QDA is affine-invariant: pooled-standardization training folded
    back to raw space must predict the same classes."""
    n = 300
    cls0 = RNG.multivariate_normal([0, 0], [[1.0, 0.3], [0.3, 0.5]], n)
    cls1 = RNG.multivariate_normal([30, 300], [[50.0, -2.0], [-2.0, 1500.0]], n)
    rows0 = [(float(a), float(b)) for a, b in cls0]
    rows1 = [(float(a), float(b)) for a, b in cls1]
    t0, t1 = triple_of(rows0, [0, 1], []), triple_of(rows1, [0, 1], [])
    raw = qda_train([t0, t1], labels=[0, 1])
    norm = qda_train([t0, t1], labels=[0, 1], normalize=True)

    def pred(model, x):
        x = np.asarray(x)
        s = [x @ model.quad[k] @ x + model.lin[k] @ x + model.intercept[k] for k in (0, 1)]
        return int(np.argmax(s))

    agree = sum(pred(raw, r) == pred(norm, r) for r in rows0 + rows1)
    assert agree / (2 * n) > 0.99


def test_nb_strict_unseen_matches_reference_tiebreak(spark):
    """PARITY #5 closed behind a flag: with strict_unseen=True ANY
    zero-probability factor floors the class to -inf, and a row unseen
    in every class falls back to the FIRST class (argmax first-max) —
    the reference's behavior (naive_bayes.cpp:236-253).  The default
    keeps ordering information: a class missing FEWER factors wins."""
    from duckdb_imputation_spark.functions.triple import Triple
    from duckdb_imputation_spark.ml.nb import nb_predict_expr, nb_train
    from pyspark.sql import functions as F

    # one numeric + TWO categorical columns; class 20 has seen c2=7,
    # class 10 has seen neither test category
    t0 = Triple(d_num=1, d_cat=2, n=4, lin=[4.0], quad=[4.0],
                lin_cat=[{1: 4.0}, {5: 4.0}], nb=True)
    t1 = Triple(d_num=1, d_cat=2, n=6, lin=[30.0], quad=[151.0],
                lin_cat=[{2: 6.0}, {7: 6.0}], nb=True)
    model = nb_train([t0, t1], labels=[10, 20])

    df = spark.createDataFrame(
        [(0, 5.0, 9, 7), (1, 5.0, 2, 7)], "id long, x double, c1 int, c2 int"
    )
    cols = (["x"], ["c1", "c2"])
    strict = {
        r.id: r.p
        for r in df.select(
            "id",
            nb_predict_expr(model, *cols, strict_unseen=True).alias("p"),
        ).collect()
    }
    # row 0: c1=9 unseen in BOTH classes -> every score -inf -> FIRST (10)
    assert strict[0] == 10
    # row 1: fully seen by class 20 only -> 20
    assert strict[1] == 20
    default = {
        r.id: r.p
        for r in df.select(
            "id", nb_predict_expr(model, *cols).alias("p")
        ).collect()
    }
    # default: class 10 misses two factors (-2e30), class 20 one (-1e30)
    # -> the informative ordering picks 20 where strict falls back to 10
    assert default[0] == 20
    assert default[1] == 20


# --------------------------------------------------------------------- #
# second-order stats from the triple (ml/stats.py)                      #
# --------------------------------------------------------------------- #


def test_covariance_matrix_matches_numpy(spark):
    import numpy as np

    from duckdb_imputation_spark.ml.stats import (
        correlation_matrix,
        second_order_stats,
    )

    rng = np.random.default_rng(31)
    data = rng.normal(0, 5, size=(300, 3)).round(3)
    rows = [tuple(float(x) for x in r) for r in data]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    n, mean, cov = second_order_stats(df, ["a", "b", "c"])
    assert n == 300
    assert np.allclose(mean, data.mean(axis=0), atol=1e-9)
    assert np.allclose(cov, np.cov(data.T, bias=True), atol=1e-8)
    corr = correlation_matrix(df, ["a", "b", "c"])
    assert np.allclose(corr, np.corrcoef(data.T), atol=1e-8)


def test_covariance_null_rows_excluded(spark):
    import numpy as np

    from duckdb_imputation_spark.ml.stats import second_order_stats

    rows = [(1.0, 2.0), (3.0, 6.0), (None, 99.0), (5.0, 10.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    n, mean, cov = second_order_stats(df, ["a", "b"])
    clean = np.array([[1.0, 2.0], [3.0, 6.0], [5.0, 10.0]])
    assert n == 3
    assert np.allclose(mean, clean.mean(axis=0))
    assert np.allclose(cov, np.cov(clean.T, bias=True))


def test_correlation_zero_variance_column(spark):
    import numpy as np

    from duckdb_imputation_spark.ml.stats import correlation_matrix

    rows = [(1.0, 7.0), (2.0, 7.0), (3.0, 7.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    corr = correlation_matrix(df, ["a", "b"])
    assert corr[0, 0] == 1.0 and corr[1, 1] == 1.0
    assert np.isnan(corr[0, 1]) and np.isnan(corr[1, 0])


def test_covariance_matches_spark_builtin(spark):
    """Triple-derived covariance == Spark's own covar_pop on real data."""
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.ml.stats import covariance_matrix

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    cov = covariance_matrix(li, cols)
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            want = li.agg(F.covar_pop(a, b)).first()[0]
            assert abs(cov[i, j] - want) < 1e-6 * max(1.0, abs(want)), (a, b)


def test_grouped_covariance_matches_spark_builtin(spark):
    """In-engine grouped covariance (one cofactor pass) == covar_pop
    GROUP BY, for every group and pair."""
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.ml.stats import grouped_covariance

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    got = {
        (r["l_returnflag"], r["col_x"], r["col_y"]): (r["n"], r["cov"])
        for r in grouped_covariance(li, cols, ["l_returnflag"]).collect()
    }
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i > j:
                continue
            want = {
                r["l_returnflag"]: (r["n"], r["c"])
                for r in li.groupBy("l_returnflag")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.covar_pop(a, b).alias("c"),
                )
                .collect()
            }
            for g, (n, c) in want.items():
                gn, gc = got[(g, a, b)]
                assert gn == n
                assert abs(gc - c) < 1e-6 * max(1.0, abs(c)), (g, a, b)


def test_grouped_covariance_plan_single_aggregation(spark):
    """The whole per-group matrix rides ONE cofactor exchange — no
    per-pair aggregates."""
    from duckdb_imputation_spark.ml.stats import grouped_covariance
    from duckdb_imputation_spark.plans import count_exchanges

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = grouped_covariance(
        li, ["l_quantity", "l_extendedprice"], ["l_returnflag"]
    )
    out.collect()
    # AQE's executed-plan toString prints the final AND initial plans,
    # so the ONE cofactor exchange appears twice; anything above 2
    # would mean a per-pair re-aggregation crept in
    assert count_exchanges(out) <= 2


def test_grouped_simple_linreg_matches_duckdb_regr(spark):
    """Per-group closed-form regression from one grouped triple pass
    must match DuckDB's regr_slope/regr_intercept aggregates."""
    import duckdb

    from duckdb_imputation_spark.ml.stats import grouped_simple_linreg

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["n"], r["slope"], r["intercept"])
        for r in grouped_simple_linreg(
            li, "l_quantity", "l_extendedprice", ["l_returnflag"]
        ).collect()
    }
    exp = duckdb.sql("""
        SELECT l_returnflag,
               regr_count(l_extendedprice, l_quantity) AS n,
               regr_slope(l_extendedprice, l_quantity) AS s,
               regr_intercept(l_extendedprice, l_quantity) AS i
        FROM '/root/testdata/sf0.001/lineitem.parquet'
        GROUP BY l_returnflag
    """).fetchall()
    for flag, n, s, i in exp:
        gn, gs, gi = got[flag]
        assert gn == n
        assert abs(gs - s) < 1e-6 * max(1.0, abs(s))
        assert abs(gi - i) < 1e-6 * max(1.0, abs(i))


def test_grouped_simple_linreg_constant_x_is_null(spark):
    from duckdb_imputation_spark.ml.stats import grouped_simple_linreg

    df = spark.createDataFrame(
        [("a", 2.0, 1.0), ("a", 2.0, 5.0), ("b", 1.0, 1.0), ("b", 3.0, 5.0)],
        "g string, x double, y double",
    )
    got = {
        r["g"]: (r["slope"], r["intercept"])
        for r in grouped_simple_linreg(df, "x", "y", ["g"]).collect()
    }
    assert got["a"] == (None, None)          # constant x: SQL regr NULL
    assert abs(got["b"][0] - 2.0) < 1e-12    # (1,1)->(3,5): slope 2
    assert abs(got["b"][1] + 1.0) < 1e-12    # intercept -1
