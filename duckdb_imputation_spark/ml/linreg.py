"""Ridge / stochastic linear regression trained from a triple.

Re-derivation of the reference's ``linreg_train`` — batch gradient descent
on the sigma matrix, not on data — with backtracking line search and
Barzilai–Borwein step sizing (duckdb_extension/src/ML/regression.cpp:
compute_gradient :29-46, compute_error :48-77, compute_step_size :79-105,
main loop :108-354), and of ``linreg_predict`` (:397-509).

Also provides a closed-form solver (normal equations on the same sigma)
— the BGD fixed point satisfies (Σ_ff/N + λD) w = Σ_f,label/N with the
intercept unregularized, so both agree on well-conditioned problems; the
closed form is the default for MICE speed, ``method="bgd"`` gives
reference-faithful iteration.

Training is driver-side NumPy (the matrix is ≤ (1+20+Σ|cats|)²);
prediction is a generated Column expression — no Python in the scoring
path, exactly like the reference's MICE-low which bakes coefficients into
generated SQL (imputation/algorithms/imputation_low.cpp:125-136).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.triple import Triple
from .sigma import build_sigma, one_hot_dictionary, standardize_sigma

__all__ = ["LinRegModel", "linreg_train", "linreg_predict_expr"]


@dataclass
class LinRegModel:
    """Trained model in raw (unstandardized) space.

    ``coef_num[i]`` pairs with the i-th *feature* numeric column (the
    label column removed); ``coef_cat[j]`` maps category -> coefficient
    for the j-th categorical column.
    """

    intercept: float
    coef_num: list[float]
    coef_cat: list[dict[int, float]] = field(default_factory=list)
    std: float | None = None  # noise std (compute_variance=True)
    label_idx: int = 0
    iterations: int = 0

    def predict_expr(
        self,
        num_cols: list[str],
        cat_cols: list[str] = (),
        add_noise: bool = False,
        seed: int | None = None,
    ) -> Column:
        return linreg_predict_expr(self, num_cols, cat_cols, add_noise, seed)

    def to_params_blob(self) -> list[float]:
        """Serialize to the reference's flat FLOAT[] layout
        (regression.cpp:289-353): [n_cat, cat_idxs(n_cat+1)…, cat_array…,
        intercept, num coefs (label removed), 1-hot coefs…, (std)].
        Means are not stored — normalization is folded into the intercept
        at train time (PARITY.md #4)."""
        n_cat = len(self.coef_cat)
        blob: list[float] = [float(n_cat)]
        if n_cat:
            idxs = [0]
            cat_array: list[int] = []
            for m in self.coef_cat:
                cat_array.extend(sorted(m))
                idxs.append(len(cat_array))
            blob += [float(x) for x in idxs]
            blob += [float(k) for k in cat_array]
        blob.append(float(self.intercept))
        blob += [float(w) for w in self.coef_num]
        for m in self.coef_cat:
            blob += [float(m[k]) for k in sorted(m)]
        if self.std is not None:
            blob.append(float(self.std))
        return blob

    @classmethod
    def from_params_blob(
        cls, blob: list[float], n_num_features: int, has_std: bool = False
    ) -> "LinRegModel":
        """Parse the reference layout back (regression.cpp:421-467)."""
        n_cat = int(blob[0])
        pos = 1
        cat_idxs, cat_array = [0], []
        if n_cat:
            cat_idxs = [int(x) for x in blob[pos : pos + n_cat + 1]]
            pos += n_cat + 1
            cat_array = [int(x) for x in blob[pos : pos + cat_idxs[-1]]]
            pos += cat_idxs[-1]
        intercept = float(blob[pos])
        pos += 1
        coef_num = [float(x) for x in blob[pos : pos + n_num_features]]
        pos += n_num_features
        coef_cat = []
        for j in range(n_cat):
            keys = cat_array[cat_idxs[j] : cat_idxs[j + 1]]
            coef_cat.append(
                {k: float(v) for k, v in zip(keys, blob[pos : pos + len(keys)])}
            )
            pos += len(keys)
        std = float(blob[pos]) if has_std else None
        return cls(
            intercept=intercept, coef_num=coef_num, coef_cat=coef_cat, std=std
        )


def _theta_to_model(
    theta: np.ndarray,
    label_pos: int,
    d: int,
    cat_idxs: list[int],
    cat_array: list[int],
    std: float | None,
    label: int,
    iterations: int,
) -> LinRegModel:
    coef_num = [float(theta[i + 1]) for i in range(d) if i != label]
    coef_cat = []
    base = 1 + d
    c = len(cat_idxs) - 1
    for j in range(c):
        keys = cat_array[cat_idxs[j] : cat_idxs[j + 1]]
        coef_cat.append(
            {int(k): float(theta[base + cat_idxs[j] + i]) for i, k in enumerate(keys)}
        )
    return LinRegModel(
        intercept=float(theta[0]),
        coef_num=coef_num,
        coef_cat=coef_cat,
        std=std,
        label_idx=label,
        iterations=iterations,
    )


def linreg_train(
    triple: Triple,
    label: int,
    step_size: float = 1e-3,
    lambda_: float = 0.0,
    max_iter: int = 1000,
    compute_variance: bool = False,
    normalize: bool = False,
    method: str = "closed",
) -> LinRegModel:
    """Train ridge linear regression for numeric column ``label`` (0-based
    index among the triple's continuous columns) from its sufficient
    statistics.  ``method="bgd"`` runs the reference's gradient loop;
    ``"closed"`` solves the same normal equations directly."""
    d = triple.d_num
    if not 0 <= label < d:
        raise ValueError(f"label index {label} out of range for {d} numeric cols")
    cat_idxs, cat_array = one_hot_dictionary([triple])
    sigma = build_sigma(triple, cat_idxs, cat_array, label_cat=-1)
    size = sigma.shape[0]
    n = sigma[0, 0]
    label_pos = label + 1

    means = stds = None
    if normalize:
        means, stds = standardize_sigma(sigma)

    iterations = 0
    if method == "closed":
        mask = np.ones(size, bool)
        mask[label_pos] = False
        reg = np.ones(mask.sum())
        reg[0] = 0.0  # intercept unregularized (regression.cpp:188-199)
        A = sigma[np.ix_(mask, mask)] / n + lambda_ * np.diag(reg)
        b = sigma[mask, label_pos] / n
        w, *_ = np.linalg.lstsq(A, b, rcond=None)
        theta = np.zeros(size)
        theta[mask] = w
        theta[label_pos] = -1.0
    elif method == "bgd":
        theta, iterations = _bgd(sigma, label_pos, step_size, lambda_, max_iter)
    else:
        raise ValueError(f"unknown method {method!r}")

    std = None
    if compute_variance:
        t = theta.copy()
        t[label_pos] = -1.0
        std = math.sqrt(max(float(t @ sigma @ t) / n, 0.0))

    if normalize:
        # Rescale coefficients to raw space (regression.cpp:266-273).  The
        # reference keeps the column means in the parameter blob and
        # subtracts them at predict time; we fold −Σ wᵢ·meanᵢ into the
        # intercept instead so the model is a plain affine form.
        for i in range(1, size):
            if i == label_pos:
                continue
            theta[i] = theta[i] / stds[i] * stds[label_pos] if stds[i] else 0.0
        theta[0] = theta[0] * stds[label_pos] + means[label_pos]
        theta[0] -= sum(
            theta[i] * means[i] for i in range(1, size) if i != label_pos
        )
        if std is not None:
            std *= stds[label_pos]

    return _theta_to_model(
        theta, label_pos, d, cat_idxs, cat_array, std, label, iterations
    )


def _bgd(
    sigma: np.ndarray,
    label_pos: int,
    step_size: float,
    lambda_: float,
    max_iter: int,
) -> tuple[np.ndarray, int]:
    """The reference's gradient loop, faithfully (regression.cpp:160-245)."""
    size = sigma.shape[0]
    n = sigma[0, 0]

    def gradient(theta: np.ndarray) -> np.ndarray:
        g = (sigma @ theta) / n
        g[label_pos] = 0.0
        return g

    def error(theta: np.ndarray) -> float:
        e = float(theta @ sigma @ theta) / n
        pn = float(theta[1:] @ theta[1:]) - 1.0  # label coef correction
        return (e + lambda_ * pn) / 2.0

    theta = np.zeros(size)
    theta[label_pos] = -1.0
    grad = gradient(theta)
    upd0 = grad.copy()
    upd0[1:] += lambda_ * theta[1:]
    first_norm = math.sqrt(max(float(upd0 @ upd0) - lambda_**2, 0.0))
    prev_error = error(theta)
    prev_theta = theta.copy()
    prev_grad = grad.copy()

    it = 1
    while it < max_iter:
        update = grad.copy()
        update[1:] += lambda_ * theta[1:]
        gradient_norm_sq = float(update @ update) - lambda_**2
        prev_theta, prev_grad = theta.copy(), grad.copy()
        theta = theta - step_size * update
        theta[label_pos] = -1.0
        dparam_norm = step_size * math.sqrt(float(update @ update))

        err = error(theta)
        backtracks = 0
        while (
            err > prev_error - (step_size / 2.0) * gradient_norm_sq
            and backtracks < 500
        ):
            step_size /= 2.0
            theta = prev_theta - step_size * update
            theta[label_pos] = -1.0
            dparam_norm = step_size * math.sqrt(float(update @ update))
            err = error(theta)
            backtracks += 1

        gnorm = math.sqrt(max(gradient_norm_sq, 0.0))
        if dparam_norm < 1e-20 or gnorm / (first_norm + 0.001) < 1e-8:
            break
        grad = gradient(theta)
        # Barzilai–Borwein step (compute_step_size, regression.cpp:79-105)
        dtheta = theta - prev_theta
        dgrad = grad - prev_grad
        dss = float(dtheta @ dtheta)
        gss = float(dgrad @ dgrad)
        dgs = float(dtheta @ dgrad)
        if dgs != 0.0 and gss != 0.0:
            ts, tm = dss / dgs, dgs / gss
            if ts >= 0.0 and tm >= 0.0:
                step_size = tm if tm / ts > 0.5 else ts - 0.5 * tm
        prev_error = err
        it += 1
    return theta, it


def linreg_predict_expr(
    model: LinRegModel,
    num_cols: list[str],
    cat_cols: list[str] = (),
    add_noise: bool = False,
    seed: int | None = None,
) -> Column:
    """ŷ as a pure Column expression (regression.cpp:397-509): intercept +
    Σ wᵢxᵢ + per-category coefficient lookups; ``add_noise`` adds
    N(0, std²) via ``randn`` (the *stochastic* linear regression of the
    paper — we take a seed instead of /dev/urandom so runs reproduce)."""
    if len(num_cols) != len(model.coef_num):
        raise ValueError("num_cols must list the feature columns (label removed)")
    expr = F.lit(float(model.intercept))
    for w, colname in zip(model.coef_num, num_cols):
        expr = expr + F.lit(float(w)) * F.col(colname).cast("double")
    for cmap, colname in zip(model.coef_cat, cat_cols):
        if not cmap:
            continue
        mapping = F.create_map(
            *[F.lit(x) for kv in sorted(cmap.items()) for x in kv]
        )
        expr = expr + F.coalesce(
            F.element_at(mapping, F.col(colname).cast("int")), F.lit(0.0)
        )
    if add_noise:
        if model.std is None:
            raise ValueError("train with compute_variance=True to add noise")
        rnd = F.randn(seed) if seed is not None else F.randn()
        expr = expr + rnd * F.lit(float(model.std))
    return expr
