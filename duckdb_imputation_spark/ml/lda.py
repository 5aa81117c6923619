"""Linear discriminant analysis trained from a triple.

Re-derivation of the reference's ``lda_train`` / ``lda_predict``
(duckdb_extension/src/ML/lda.cpp): per-class sum vector from the triple
(build_sum_vector :58-144), pooled within-class scatter Σ − Σ_c s_c s_cᵀ/n_c
(:242-251), shrinkage toward μI (:257-279), solve coef = S⁻¹M by least
squares (dgelsd :283-297 → np.linalg.lstsq), intercept −½μᵀcoef + log prior
(:309-320).  Equivalent to sklearn LinearDiscriminantAnalysis(solver='lsqr')
— the reference's own oracle (test/python/test_LDA.py:115-120).

Prediction is a generated Column expression: argmax over per-class affine
scores with dictionary-lookup one-hot for categorical features.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.triple import Triple
from .sigma import (
    build_class_sums,
    build_sigma,
    one_hot_dictionary,
    standardize_sigma,
)

__all__ = ["LDAModel", "lda_train", "lda_predict_expr"]


@dataclass
class LDAModel:
    class_keys: list[int]  # sorted class labels (values of the label column)
    intercept: list[float]  # per class
    coef_num: list[list[float]]  # per class, per numeric feature
    coef_cat: list[list[dict[int, float]]]  # per class, per cat feature col
    label_cat_idx: int = 0

    def predict_expr(self, num_cols: list[str], cat_cols: list[str] = ()) -> Column:
        return lda_predict_expr(self, num_cols, cat_cols)

    def to_params_blob(self) -> list[float]:
        """Serialize to the reference's flat FLOAT[] layout
        (lda.cpp:336-380): [n_classes, size_idxs, feature cat_idxs
        (label slots removed), feature cat dictionary, class labels,
        per-class coefficient rows (nums then one-hots), intercepts]."""
        K = len(self.class_keys)
        n_feat_cats = len(self.coef_cat[0]) if K else 0
        blob: list[float] = [float(K)]
        # size_idxs: 0 when the label was the only categorical column
        size_idxs = 0 if n_feat_cats == 0 else n_feat_cats + 1
        blob.append(float(size_idxs))
        if n_feat_cats:
            idxs = [0]
            cat_array: list[int] = []
            for m in self.coef_cat[0]:
                cat_array.extend(sorted(m))
                idxs.append(len(cat_array))
            blob += [float(x) for x in idxs]
            blob += [float(k) for k in cat_array]
        blob += [float(k) for k in self.class_keys]
        for k in range(K):
            blob += [float(w) for w in self.coef_num[k]]
            for m in self.coef_cat[k]:
                blob += [float(m[key]) for key in sorted(m)]
        blob += [float(b) for b in self.intercept]
        return blob


def lda_train(
    triple: Triple,
    label: int,
    shrinkage: float = 0.0,
    normalize: bool = False,
) -> LDAModel:
    """Train LDA with categorical column ``label`` (0-based index among the
    triple's categorical columns) as the class."""
    c = triple.d_cat
    if not 0 <= label < c:
        raise ValueError(f"label {label} out of range for {c} categorical cols")
    d = triple.d_num
    cat_idxs, cat_array = one_hot_dictionary([triple])
    sigma = build_sigma(triple, cat_idxs, cat_array, label_cat=label)
    class_keys, sums = build_class_sums(triple, label, cat_idxs, cat_array)
    n_total = float(triple.n)

    stds = None
    if normalize:
        means, stds = standardize_sigma(sigma)
        for k in range(len(class_keys)):
            cnt = sums[k, 0]
            with np.errstate(divide="ignore", invalid="ignore"):
                scaled = (sums[k, 1:] - means[1:] * cnt) / stds[1:]
            sums[k, 1:] = np.where(stds[1:] > 0, scaled, 0.0)

    size = sigma.shape[0]
    p = size - 1
    S = sigma[1:, 1:].copy()
    K = len(class_keys)
    mean_mat = np.zeros((p, K))
    for k in range(K):
        n_k = sums[k, 0]
        s_k = sums[k, 1:]
        S -= np.outer(s_k, s_k) / n_k
        mean_mat[:, k] = s_k / n_k

    mu = np.trace(S) / p
    S = S * (1.0 - shrinkage)
    S[np.diag_indices(p)] += shrinkage * mu
    S /= n_total

    coef, *_ = np.linalg.lstsq(S, mean_mat, rcond=-1)  # p × K
    intercept = [
        float(-0.5 * mean_mat[:, k] @ coef[:, k] + math.log(sums[k, 0] / n_total))
        for k in range(K)
    ]

    if normalize:
        # Rescale coefficients to raw space and fold the mean-centering into
        # the intercepts (the reference centers by stored means at predict
        # time, lda.cpp:533-549; like linreg we make the model plain affine:
        # coef_z·(x−μ)/σ + b  ≡  (coef_z/σ)·x + (b − (coef_z/σ)·μ)).
        with np.errstate(divide="ignore", invalid="ignore"):
            coef = np.where(stds[1:, None] > 0, coef / stds[1:, None], 0.0)
        for k in range(K):
            intercept[k] -= float(coef[:, k] @ means[1:])

    # slice coef rows back into numeric + per-cat-column maps
    label_width = cat_idxs[label + 1] - cat_idxs[label]
    coef_num = [[float(coef[i, k]) for i in range(d)] for k in range(K)]
    coef_cat: list[list[dict[int, float]]] = [[] for _ in range(K)]
    for j in range(c):
        if j == label:
            continue
        shift = label_width if j > label else 0
        base = d + cat_idxs[j] - shift
        keys = cat_array[cat_idxs[j] : cat_idxs[j + 1]]
        for k in range(K):
            coef_cat[k].append(
                {int(key): float(coef[base + i, k]) for i, key in enumerate(keys)}
            )
    return LDAModel(
        class_keys=[int(k) for k in class_keys],
        intercept=intercept,
        coef_num=coef_num,
        coef_cat=coef_cat,
        label_cat_idx=label,
    )


def _class_score(
    intercept: float,
    coef_num: list[float],
    coef_cat: list[dict[int, float]],
    num_cols: list[str],
    cat_cols: list[str],
) -> Column:
    expr = F.lit(float(intercept))
    for w, colname in zip(coef_num, num_cols):
        expr = expr + F.lit(float(w)) * F.col(colname).cast("double")
    for cmap, colname in zip(coef_cat, cat_cols):
        if not cmap:
            continue
        mapping = F.create_map(*[F.lit(x) for kv in sorted(cmap.items()) for x in kv])
        expr = expr + F.coalesce(
            F.element_at(mapping, F.col(colname).cast("int")), F.lit(0.0)
        )
    return expr


def lda_predict_expr(
    model: LDAModel, num_cols: list[str], cat_cols: list[str] = ()
) -> Column:
    """argmax_c (coef_c·x + intercept_c) → class label, as a Column
    expression (lda.cpp:421-590).  ``cat_cols`` are the categorical
    *feature* columns (label column excluded), in training order."""
    scores = F.array(
        *[
            _class_score(
                model.intercept[k],
                model.coef_num[k],
                model.coef_cat[k],
                num_cols,
                list(cat_cols),
            )
            for k in range(len(model.class_keys))
        ]
    )
    labels = F.array(*[F.lit(int(k)) for k in model.class_keys])
    return F.element_at(labels, F.array_position(scores, F.array_max(scores)).cast("int"))
