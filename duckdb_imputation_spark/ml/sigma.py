"""Triple → dense sigma matrix with 1-hot categorical expansion.

NumPy re-derivation of the reference's driver math
(duckdb_extension/src/ML/utils.cpp): ``n_cols_1hot_expansion``
(:520-576), ``build_sigma_matrix`` (:176-310), ``standardize_sigma``
(:580-598), ``get_num_categories``/``sizeof_sigma_matrix`` (:485-507),
plus the LDA per-class sum vector (ML/lda.cpp:58-144).

The sigma matrix is tiny — (1 + d_num + Σ|categories|)² — so this is
driver-side work by design: the cluster produces the triple, the driver
trains (SURVEY §3.2).
"""

from __future__ import annotations

import numpy as np

from ..functions.triple import Triple, pair_index

__all__ = [
    "one_hot_dictionary",
    "build_sigma",
    "build_class_sums",
    "standardize_sigma",
]


def one_hot_dictionary(
    triples: list[Triple], drop_first: bool = False
) -> tuple[list[int], list[int]]:
    """Sorted unique categorical values per cat column, across aggregates.

    Returns ``(cat_idxs, cat_array)``: ``cat_array[cat_idxs[j]:cat_idxs[j+1]]``
    are the sorted category values of cat column j.  ``drop_first`` removes
    the first (smallest) category of every column — used by QDA to avoid
    a collinear (non-invertible) design (qda.cpp:47, utils.cpp:565-572).
    """
    c = triples[0].d_cat
    cat_idxs = [0]
    cat_array: list[int] = []
    for j in range(c):
        keys: set[int] = set()
        for t in triples:
            keys.update(t.lin_cat[j].keys())
        col = sorted(keys)
        if drop_first:
            col = col[1:]
        cat_array.extend(col)
        cat_idxs.append(len(cat_array))
    return cat_idxs, cat_array


def _pos_maps(
    d_num: int, cat_idxs: list[int], cat_array: list[int], label_cat: int
) -> tuple[int, list[dict[int, int] | None]]:
    """(matrix size, per-cat-col {key -> matrix index}; None = excluded)."""
    c = len(cat_idxs) - 1
    label_width = (
        cat_idxs[label_cat + 1] - cat_idxs[label_cat] if label_cat >= 0 else 0
    )
    maps: list[dict[int, int] | None] = []
    for j in range(c):
        if j == label_cat:
            maps.append(None)
            continue
        shift = label_width if label_cat >= 0 and j > label_cat else 0
        base = 1 + d_num + cat_idxs[j] - shift
        keys = cat_array[cat_idxs[j] : cat_idxs[j + 1]]
        maps.append({k: base + i for i, k in enumerate(keys)})
    n_cats_kept = cat_idxs[c] - label_width
    return 1 + d_num + n_cats_kept, maps


def build_sigma(
    t: Triple,
    cat_idxs: list[int],
    cat_array: list[int],
    label_cat: int = -1,
) -> np.ndarray:
    """Dense symmetric sigma matrix from a triple (utils.cpp:176-310).

    ``label_cat >= 0`` excludes that categorical column (the class label)
    from the matrix.  Keys absent from the dictionary (e.g. dropped by
    ``drop_first``) are skipped, as in the reference.
    """
    d = t.d_num
    c = t.d_cat
    size, pos = _pos_maps(d, cat_idxs, cat_array, label_cat)
    sigma = np.zeros((size, size))
    sigma[0, 0] = t.n
    for i in range(d):
        sigma[0, i + 1] = sigma[i + 1, 0] = t.lin[i]
        for j in range(i, d):
            v = t.quad[pair_index(i, j, d)]
            sigma[i + 1, j + 1] = sigma[j + 1, i + 1] = v
    for j in range(c):
        if pos[j] is None:
            continue
        for k, v in t.lin_cat[j].items():
            p = pos[j].get(k)
            if p is None:
                continue
            sigma[0, p] = sigma[p, 0] = v
            sigma[p, p] = v
    for i in range(d):
        for j in range(c):
            if pos[j] is None:
                continue
            for k, v in t.quad_num_cat[i * c + j].items():
                p = pos[j].get(k)
                if p is None:
                    continue
                sigma[p, i + 1] = sigma[i + 1, p] = v
    idx = 0
    for j1 in range(c):
        for j2 in range(j1, c):
            m = t.quad_cat[idx]
            idx += 1
            if pos[j1] is None or pos[j2] is None:
                continue
            for (k1, k2), v in m.items():
                p1 = pos[j1].get(k1)
                p2 = pos[j2].get(k2)
                if p1 is None or p2 is None:
                    continue
                sigma[p1, p2] = v
                sigma[p2, p1] = v
    return sigma


def build_class_sums(
    t: Triple,
    label_cat: int,
    cat_idxs: list[int],
    cat_array: list[int],
) -> tuple[list[int], np.ndarray]:
    """Per-class [count, Σ feature] rows for LDA (lda.cpp:58-144).

    Returns ``(class_keys, sums)`` where ``sums[k]`` is the row for class
    ``class_keys[k]`` (sorted), laid out like the sigma matrix columns
    with the label excluded: [count, nums..., one-hot cats...].
    """
    d, c = t.d_num, t.d_cat
    size, pos = _pos_maps(d, cat_idxs, cat_array, label_cat)
    class_keys = sorted(t.lin_cat[label_cat].keys())
    k_index = {k: i for i, k in enumerate(class_keys)}
    sums = np.zeros((len(class_keys), size))
    for k, v in t.lin_cat[label_cat].items():
        sums[k_index[k], 0] = v
    for i in range(d):
        for k, v in t.quad_num_cat[i * c + label_cat].items():
            sums[k_index[k], i + 1] = v
    idx = 0
    for j1 in range(c):
        for j2 in range(j1, c):
            m = t.quad_cat[idx]
            idx += 1
            if j1 == label_cat and j2 != label_cat:
                other, label_first = j2, True
            elif j2 == label_cat and j1 != label_cat:
                other, label_first = j1, False
            else:
                continue
            for (k1, k2), v in m.items():
                k_label, k_other = (k1, k2) if label_first else (k2, k1)
                p = pos[other].get(k_other)
                if p is None or k_label not in k_index:
                    continue
                sums[k_index[k_label], p] = v
    return class_keys, sums


def standardize_sigma(sigma: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """In-place column standardization of a sigma matrix
    (utils.cpp:580-598).  Returns (means, stds)."""
    n = sigma[0, 0]
    size = sigma.shape[0]
    means = sigma[0, :] / n
    stds = np.sqrt(np.maximum(np.diag(sigma) / n - means**2, 0.0))
    stds[0] = 0.0  # first column has zero variance, as in the reference
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(1, size):
            for j in range(1, size):
                sigma[i, j] = (
                    sigma[i, j]
                    - means[i] * sigma[0, j]
                    - means[j] * sigma[0, i]
                    + n * means[i] * means[j]
                ) / (stds[i] * stds[j])
    sigma[0, 1:] = 0.0
    sigma[1:, 0] = 0.0
    return means, stds
