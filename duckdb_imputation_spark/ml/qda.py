"""Quadratic discriminant analysis from per-class triples.

Re-derivation of the reference's ``qda_train`` / ``qda_predict``
(duckdb_extension/src/ML/qda.cpp): one triple per class (computed
upstream via GROUP BY label, README.md:179); per-class covariance from
each triple (:180-199); inversion via SVD with a small-singular-value
cutoff (:204-242); stores the quadratic term −½Σ⁻¹, linear term Σ⁻¹μ and
intercept −½μᵀΣ⁻¹μ − ½log|Σ| + log prior (:284-293); ``drop_first``
one-hot to keep the design invertible (:47, utils.cpp:565-572).

Scoring evaluates a per-row quadratic form — that's genuinely not a
sum-of-columns expression, so prediction uses an Arrow-batched pandas
UDF over broadcast parameters (the documented slow-path exception).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from ..functions.triple import Triple
from .sigma import build_sigma, one_hot_dictionary

__all__ = ["QDAModel", "qda_train", "qda_predict_expr"]


@dataclass
class QDAModel:
    class_labels: list[int]
    quad: list[np.ndarray]  # per class: m×m  (−½ Σ⁻¹)
    lin: list[np.ndarray]  # per class: m    (Σ⁻¹ μ)
    intercept: list[float]
    cat_idxs: list[int]  # drop-first dictionary over feature cat cols
    cat_array: list[int]
    d_num: int
    # normalize=True training also keeps the reference's serialized form:
    # per class the z-space params with stds folded (Q_z/(std_i·std_j),
    # L_z/std_j, z-intercept) plus the m pooled means (qda.cpp:245-251,
    # 269-271, 298-301) — predict centers raw features by the means
    # (qda.cpp:426-437), which is algebraically the raw-space model above
    norm_quad: list[np.ndarray] | None = field(default=None)
    norm_lin: list[np.ndarray] | None = field(default=None)
    norm_intercept: list[float] | None = field(default=None)
    norm_means: np.ndarray | None = field(default=None)

    @property
    def m(self) -> int:
        return self.d_num + self.cat_idxs[-1]

    def predict_expr(self, num_cols: list[str], cat_cols: list[str] = ()) -> Column:
        return qda_predict_expr(self, num_cols, cat_cols)

    def to_params_blob(self) -> list[float]:
        """Serialize to the reference's flat FLOAT[] layout
        (qda.cpp:67-109 header, 252-293 per-class blocks):
        [n_classes, n_cat+1 (or 0), cat_idxs (drop-first), cat_array,
        class labels, then per class: m×m quadratic term (−½Σ⁻¹,
        row-major), m linear terms (Σ⁻¹μ), intercept].

        A normalize=True model serializes the reference's normalized
        layout instead: per class the z-space quad scaled by
        1/(std_i·std_j) (qda.cpp:245-251), the z-space lin scaled by
        1/std_j (:269-271) and the UNscaled z-space intercept, with the
        m pooled feature means appended after the class blocks
        (:298-301) — the reference's predict subtracts the means from
        the raw features before applying these params (:426-437)."""
        K = len(self.class_labels)
        c = len(self.cat_idxs) - 1
        m = self.m
        normalized = self.norm_quad is not None
        quads = self.norm_quad if normalized else self.quad
        lins = self.norm_lin if normalized else self.lin
        icpts = self.norm_intercept if normalized else self.intercept
        blob: list[float] = [float(K)]
        if c > 0:
            blob.append(float(c + 1))
            blob += [float(x) for x in self.cat_idxs]
            blob += [float(k) for k in self.cat_array]
        else:
            blob.append(0.0)
        blob += [float(x) for x in self.class_labels]
        for k in range(K):
            blob += [float(quads[k][i, j]) for i in range(m) for j in range(m)]
            blob += [float(x) for x in lins[k]]
            blob.append(float(icpts[k]))
        if normalized:
            blob += [float(x) for x in self.norm_means]
        return blob


def qda_train(
    triples: list[Triple], labels: list[int], normalize: bool = False
) -> QDAModel:
    """Train QDA from one triple per class (labels[i] names triples[i]'s
    class).  The label column itself must not be in the triples.

    ``normalize=True`` standardizes with POOLED means/stds computed from
    the summed class sigmas (qda.cpp:128-143) and folds the standardized
    model back into a raw-space quadratic form, so prediction stays the
    same ``xᵀQx + Lx + b``.  QDA is affine-invariant, so this changes
    conditioning, not (up to numerics) predictions.
    """
    cat_idxs, cat_array = one_hot_dictionary(triples, drop_first=True)
    d = triples[0].d_num
    n_total = float(sum(t.n for t in triples))
    sigmas = [build_sigma(t, cat_idxs, cat_array, label_cat=-1) for t in triples]

    g_means = g_stds = None
    if normalize:
        size = sigmas[0].shape[0]
        g_means = np.zeros(size)
        g_var = np.zeros(size)
        for s_m in sigmas:
            g_means += s_m[0, :]
            g_var += np.diag(s_m)
        g_means /= n_total
        g_stds = np.sqrt(np.maximum(g_var / n_total - g_means**2, 1e-30))
        g_stds[0] = 1.0
        for s_m in sigmas:
            n_c = s_m[0, 0]
            raw0 = s_m[0, :].copy()
            for i in range(1, size):
                for j in range(1, size):
                    s_m[i, j] = (
                        s_m[i, j]
                        - g_means[i] * raw0[j]
                        - g_means[j] * raw0[i]
                        + n_c * g_means[i] * g_means[j]
                    ) / (g_stds[i] * g_stds[j])
            for i in range(1, size):
                s_m[0, i] = s_m[i, 0] = (raw0[i] - g_means[i] * n_c) / g_stds[i]

    quads, lins, intercepts = [], [], []
    n_quads, n_lins, n_icpts = [], [], []
    for sigma in sigmas:
        n_c = sigma[0, 0]
        s = sigma[0, 1:]
        mu = s / n_c
        cov = (sigma[1:, 1:] - np.outer(s, s) / n_c) / n_c
        u, sv, vt = np.linalg.svd(cov)
        # reference quirk kept as spec: tiny singular values are *not*
        # zeroed — their raw value is used as its own "inverse"
        # (qda.cpp:224-231)
        sinv = np.where(sv > 1e-9, 1.0 / np.where(sv > 1e-9, sv, 1.0), sv)
        inv = vt.T @ np.diag(sinv) @ u.T
        det = float(np.prod(sv))
        quad_z = -inv / 2.0
        lin_z = inv @ mu
        icpt_z = float(
            -0.5 * mu @ lin_z - 0.5 * math.log(det) + math.log(n_c / n_total)
        )
        if normalize:
            # fold z = (x − m)/s back to raw space:
            # Q_raw = D⁻¹ Q D⁻¹ ;  L_raw = D⁻¹L − 2 D⁻¹Q D⁻¹ m
            # b_raw = mᵀD⁻¹Q D⁻¹m − LᵀD⁻¹m + b   (Q symmetric)
            Dinv = 1.0 / g_stds[1:]
            m_f = g_means[1:]
            Qr = quad_z * np.outer(Dinv, Dinv)
            Lr = Dinv * lin_z - 2.0 * (Qr @ m_f)
            br = float(m_f @ (Qr @ m_f) - (Dinv * lin_z) @ m_f + icpt_z)
            # the reference's serialized normalized form: std-folded
            # params WITHOUT the mean shift (predict centers by the
            # appended means instead, qda.cpp:426-437)
            n_quads.append(Qr)
            n_lins.append(Dinv * lin_z)
            n_icpts.append(float(icpt_z))
            quad_z, lin_z, icpt_z = Qr, Lr, br
        quads.append(quad_z)
        lins.append(lin_z)
        intercepts.append(icpt_z)
    if normalize:
        return QDAModel(
            class_labels=[int(x) for x in labels],
            quad=quads,
            lin=lins,
            intercept=intercepts,
            cat_idxs=cat_idxs,
            cat_array=cat_array,
            d_num=d,
            norm_quad=n_quads,
            norm_lin=n_lins,
            norm_intercept=n_icpts,
            norm_means=np.asarray(g_means[1:], dtype=float),
        )
    return QDAModel(
        class_labels=[int(x) for x in labels],
        quad=quads,
        lin=lins,
        intercept=intercepts,
        cat_idxs=cat_idxs,
        cat_array=cat_array,
        d_num=d,
    )


def qda_predict_expr(
    model: QDAModel, num_cols: list[str], cat_cols: list[str] = ()
) -> Column:
    """argmax_c xᵀQ_c x + L_c·x + b_c (qda.cpp:338-498) as an Arrow-batched
    pandas UDF; parameters travel once per executor via closure capture."""
    d = model.d_num
    m = model.m
    cat_idxs = list(model.cat_idxs)
    cat_array = list(model.cat_array)
    key_pos = [
        {int(k): cat_idxs[j] + i for i, k in enumerate(cat_array[cat_idxs[j] : cat_idxs[j + 1]])}
        for j in range(len(cat_idxs) - 1)
    ]
    quad = [np.asarray(q) for q in model.quad]
    lin = [np.asarray(v) for v in model.lin]
    intercept = list(model.intercept)
    class_labels = np.asarray(model.class_labels, dtype=np.int32)

    @F.pandas_udf(IntegerType())
    def _score(*cols: pd.Series) -> pd.Series:
        n = len(cols[0])
        X = np.zeros((n, m))
        for i in range(d):
            X[:, i] = cols[i].astype(float).to_numpy()
        for j, pos_map in enumerate(key_pos):
            vals = cols[d + j].to_numpy()
            for r in range(n):
                p = pos_map.get(int(vals[r]))
                if p is not None:  # dropped-first / unseen → all-zero block
                    X[r, d + p] = 1.0
        scores = np.empty((n, len(class_labels)))
        for k in range(len(class_labels)):
            scores[:, k] = (
                np.einsum("ij,jk,ik->i", X, quad[k], X)
                + X @ lin[k]
                + intercept[k]
            )
        return pd.Series(class_labels[np.argmax(scores, axis=1)])

    args = [F.col(c).cast("double") for c in num_cols] + [
        F.col(c).cast("int") for c in cat_cols
    ]
    return _score(*args)
