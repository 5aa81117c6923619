"""Gaussian + categorical Naive Bayes from per-class NB aggregates.

Re-derivation of the reference's ``nb_train`` / ``nb_predict``
(duckdb_extension/src/ML/naive_bayes.cpp): per class — prior n_c/N
(:109), Gaussian mean / variance per numeric column from the diagonal
NB aggregate (:111-117), categorical value frequencies (:121-136);
prediction multiplies prior · Π N(x; μ, σ²+1e-9) · Π freq with
**unseen categorical value ⇒ probability 0** (:236-237) and returns the
class *label* (:253).

We score in log space (monotonically identical, underflow-proof) as a
pure Column expression; the unseen-category zero becomes a −1e30 term so
such a class can never win unless every class is unseen — matching the
reference's "all probabilities 0 → first class" fallback.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.triple import Triple

__all__ = ["NBModel", "nb_train", "nb_predict_expr"]

_NEG = -1.0e30  # log-space stand-in for probability 0


@dataclass
class NBModel:
    class_labels: list[int]
    prior: list[float]
    mean: list[list[float]]  # per class, per numeric col
    var: list[list[float]]  # per class, per numeric col
    freq: list[list[dict[int, float]]]  # per class, per cat col: key -> P

    def predict_expr(self, num_cols: list[str], cat_cols: list[str] = ()) -> Column:
        return nb_predict_expr(self, num_cols, cat_cols)

    def to_params_blob(self) -> list[float]:
        """Serialize to the reference's flat FLOAT[] layout
        (naive_bayes.cpp:44-136): [n_classes, n_cat+1 (or 0), cat_idxs,
        cat_array, class labels, priors, then per class: (mean, var) per
        numeric column followed by the per-category frequency slots]."""
        K = len(self.class_labels)
        n_cat = len(self.freq[0]) if K else 0
        blob: list[float] = [float(K)]
        cat_idxs, cat_array = [0], []
        if n_cat:
            blob.append(float(n_cat + 1))
            keys_per_col = [
                sorted({k for f in self.freq for k in f[j]}) for j in range(n_cat)
            ]
            for keys in keys_per_col:
                cat_array.extend(keys)
                cat_idxs.append(len(cat_array))
            blob += [float(x) for x in cat_idxs]
            blob += [float(k) for k in cat_array]
        else:
            blob.append(0.0)
        blob += [float(x) for x in self.class_labels]
        blob += [float(p) for p in self.prior]
        for k in range(K):
            for mu, var in zip(self.mean[k], self.var[k]):
                blob += [float(mu), float(var)]
            if n_cat:
                for j in range(n_cat):
                    keys = cat_array[cat_idxs[j] : cat_idxs[j + 1]]
                    blob += [float(self.freq[k][j].get(key, 0.0)) for key in keys]
        return blob


def nb_train(nb_triples: list[Triple], labels: list[int]) -> NBModel:
    """Train from one NB aggregate per class (labels[i] names class i)."""
    n_total = float(sum(t.n for t in nb_triples))
    prior, mean, var, freq = [], [], [], []
    for t in nb_triples:
        n_c = float(t.n)
        prior.append(n_c / n_total)
        mu = [float(x) / n_c for x in t.lin]
        mean.append(mu)
        var.append(
            [float(q) / n_c - m * m for q, m in zip(t.quad, mu)]
        )
        freq.append([{k: v / n_c for k, v in cm.items()} for cm in t.lin_cat])
    return NBModel(
        class_labels=[int(x) for x in labels],
        prior=prior,
        mean=mean,
        var=var,
        freq=freq,
    )


def _class_log_score(
    model: NBModel,
    k: int,
    num_cols: list[str],
    cat_cols: list[str],
    strict_unseen: bool = False,
) -> Column:
    unseen = F.lit(False)
    expr = F.lit(math.log(model.prior[k]) if model.prior[k] > 0 else _NEG)
    for i, colname in enumerate(num_cols):
        v = model.var[k][i] + 1e-9  # reference's division-by-zero guard
        mu = model.mean[k][i]
        x = F.col(colname).cast("double")
        expr = expr + (
            F.lit(-0.5 * math.log(2.0 * math.pi * v))
            - (x - F.lit(mu)) * (x - F.lit(mu)) / F.lit(2.0 * v)
        )
    for j, colname in enumerate(cat_cols):
        cmap = model.freq[k][j]
        log_map = {key: math.log(p) if p > 0 else _NEG for key, p in cmap.items()}
        if not log_map:
            expr = expr + F.lit(_NEG)
            unseen = F.lit(True)
            continue
        mapping = F.create_map(
            *[F.lit(x) for kv in sorted(log_map.items()) for x in kv]
        )
        looked = F.element_at(mapping, F.col(colname).cast("int"))
        expr = expr + F.coalesce(looked, F.lit(_NEG))
        unseen = unseen | looked.isNull()
    if strict_unseen:
        # reference semantics (naive_bayes.cpp:236-253): a zero-probability
        # factor zeroes the whole class score; when EVERY class zeroes,
        # argmax's first-max rule returns the FIRST class, as the ref does
        return F.when(unseen, F.lit(float("-inf"))).otherwise(expr)
    return expr


def nb_predict_expr(
    model: NBModel,
    num_cols: list[str],
    cat_cols: list[str] = (),
    strict_unseen: bool = False,
) -> Column:
    """argmax_c log-score → class label, pure Column expression.

    Default scoring keeps the prior+Gaussian contribution when a
    categorical value is unseen in a class (strictly more informative);
    ``strict_unseen=True`` reproduces the reference's semantics exactly
    (PARITY #5): any zero-probability factor floors the class to -inf,
    and a row unseen in EVERY class falls back to the first class."""
    scores = F.array(
        *[
            _class_log_score(
                model, k, num_cols, list(cat_cols), strict_unseen=strict_unseen
            )
            for k in range(len(model.class_labels))
        ]
    )
    labels = F.array(*[F.lit(int(x)) for x in model.class_labels])
    return F.element_at(
        labels, F.array_position(scores, F.array_max(scores)).cast("int")
    )
