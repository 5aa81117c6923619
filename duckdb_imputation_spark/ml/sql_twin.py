"""Cross-engine ML oracle twins: train the SAME model from
DuckDB-computed triples, then emit predict SQL in the shared
Spark/DuckDB dialect with baked full-precision coefficients.

This is the reference's own oracle pattern — its MICE-low bakes trained
coefficients into generated SQL (imputation/algorithms/
imputation_low.cpp:125-136).  Why the result is hash-exact:

* every catalog ML query uses integer-valued features, so the triple's
  sums are integers held exactly in float64 — DuckDB aggregation
  reproduces Spark's cofactor bit-for-bit regardless of summation
  order;
* training is the same NumPy code on bit-identical inputs → identical
  coefficient doubles;
* ``repr(float)`` round-trips each coefficient through both SQL parsers
  to the same 64-bit value;
* the predict expression is generated with ONE operator order (mirroring
  the Column-expression builders in lda.py/nb.py term by term), so both
  engines evaluate the same float ops in the same sequence;
* argmax is emulated with a first-max CASE chain, matching Spark's
  ``array_position(scores, array_max(scores))`` tie-breaking.
"""

from __future__ import annotations

import math

import numpy as np

from ..functions.triple import Triple, cat_pairs

__all__ = [
    "full_triple_duckdb",
    "class_triples_duckdb",
    "argmax_case_sql",
    "lda_predict_sql",
    "nb_predict_sql",
    "qda_predict_sql",
]

_NEG = -1.0e30  # matches nb.py log-space stand-in for probability 0


def flit(x: float) -> str:
    """Full-precision SQL double literal (repr round-trips IEEE 754)."""
    return repr(float(x))


# ------------------------------------------------- DuckDB-side training


def full_triple_duckdb(con, rel: str, num_cols: list[str], cat_cols: list[str]) -> Triple:
    """Compute a full cofactor triple with plain SQL aggregates over
    ``rel`` (a table or parenthesized subquery exposing the named
    columns).  Bit-identical to the Spark cofactor on integer-valued
    features."""
    d, c = len(num_cols), len(cat_cols)
    t = Triple.zero(d, c)
    quad_sel = [
        f"SUM(CAST({num_cols[i]} AS DOUBLE) * CAST({num_cols[j]} AS DOUBLE))"
        for i in range(d)
        for j in range(i, d)
    ]
    sel = (
        ["COUNT(*)"]
        + [f"SUM(CAST({e} AS DOUBLE))" for e in num_cols]
        + quad_sel
    )
    row = con.sql(f"SELECT {', '.join(sel)} FROM {rel}").fetchone()
    t.n = int(row[0])
    t.lin = np.asarray(row[1 : 1 + d], dtype=np.float64)
    t.quad = np.asarray(row[1 + d :], dtype=np.float64)
    for j, ce in enumerate(cat_cols):
        sums = ", ".join(f"SUM(CAST({ne} AS DOUBLE))" for ne in num_cols)
        q = f"SELECT CAST({ce} AS INT), COUNT(*){', ' + sums if d else ''} FROM {rel} GROUP BY 1"
        for r in con.sql(q).fetchall():
            key = int(r[0])
            t.lin_cat[j][key] = float(r[1])
            for i in range(d):
                t.quad_num_cat[i * c + j][key] = float(r[2 + i])
    for p, (a, b) in enumerate(cat_pairs(c)):
        q = (
            f"SELECT CAST({cat_cols[a]} AS INT), CAST({cat_cols[b]} AS INT), "
            f"COUNT(*) FROM {rel} GROUP BY 1, 2"
        )
        for r in con.sql(q).fetchall():
            t.quad_cat[p][(int(r[0]), int(r[1]))] = float(r[2])
    return t


def class_triples_duckdb(
    con,
    rel: str,
    num_cols: list[str],
    cat_cols: list[str],
    label_col: str,
    nb: bool = False,
) -> tuple[list[int], list[Triple]]:
    """One triple per class value of ``label_col`` (classes sorted
    ascending — catalog queries sort their collected per-class rows the
    same way so train order, and thus argmax tie-breaking, matches)."""
    labels = [
        int(r[0])
        for r in con.sql(
            f"SELECT DISTINCT CAST({label_col} AS INT) FROM {rel} ORDER BY 1"
        ).fetchall()
    ]
    triples = []
    for lv in labels:
        sub = f"(SELECT * FROM {rel} WHERE CAST({label_col} AS INT) = {lv})"
        if nb:
            t = Triple.zero(len(num_cols), len(cat_cols), nb=True)
            diag = [f"SUM(CAST({e} AS DOUBLE) * CAST({e} AS DOUBLE))" for e in num_cols]
            sel = (
                ["COUNT(*)"]
                + [f"SUM(CAST({e} AS DOUBLE))" for e in num_cols]
                + diag
            )
            row = con.sql(f"SELECT {', '.join(sel)} FROM {sub}").fetchone()
            d = len(num_cols)
            t.n = int(row[0])
            t.lin = np.asarray(row[1 : 1 + d], dtype=np.float64)
            t.quad = np.asarray(row[1 + d :], dtype=np.float64)
            for j, ce in enumerate(cat_cols):
                for r in con.sql(
                    f"SELECT CAST({ce} AS INT), COUNT(*) FROM {sub} GROUP BY 1"
                ).fetchall():
                    t.lin_cat[j][int(r[0])] = float(r[1])
        else:
            t = full_triple_duckdb(con, sub, num_cols, cat_cols)
        triples.append(t)
    return labels, triples


# ------------------------------------------------ shared-dialect predict


def argmax_case_sql(scores: list[str], labels: list[int]) -> str:
    """First-max argmax as a CASE chain — same tie-breaking as Spark's
    ``element_at(labels, array_position(scores, array_max(scores)))``."""
    k = len(scores)
    if k == 1:
        return str(labels[0])
    branches = []
    for i in range(k - 1):
        cond = " AND ".join(f"({scores[i]}) >= ({scores[j]})" for j in range(i + 1, k))
        branches.append(f"WHEN {cond} THEN {labels[i]}")
    return "CASE " + " ".join(branches) + f" ELSE {labels[k - 1]} END"


def _cat_case_sql(col: str, cmap: dict[int, float], default: str) -> str:
    if not cmap:
        return default
    whens = " ".join(
        f"WHEN CAST({col} AS INT) = {k} THEN {flit(v)}" for k, v in sorted(cmap.items())
    )
    return f"COALESCE(CASE {whens} END, {default})"


def lda_predict_sql(model, num_cols: list[str], cat_cols: list[str] = ()) -> str:
    """SQL twin of lda.py ``_class_score``/``lda_predict_expr``: per-class
    affine score (intercept, then +w·x per numeric in order, then
    dictionary lookups), first-max argmax."""
    scores = []
    for k in range(len(model.class_keys)):
        s = flit(model.intercept[k])
        for w, colname in zip(model.coef_num[k], num_cols):
            s = f"({s} + ({flit(w)} * CAST({colname} AS DOUBLE)))"
        for cmap, colname in zip(model.coef_cat[k], cat_cols):
            if not cmap:
                continue
            s = f"({s} + {_cat_case_sql(colname, cmap, '0.0')})"
        scores.append(s)
    return argmax_case_sql(scores, [int(x) for x in model.class_keys])


def nb_predict_sql(model, num_cols: list[str], cat_cols: list[str] = ()) -> str:
    """SQL twin of nb.py ``_class_log_score``: log prior, then per numeric
    ``+ (c − (x−μ)·(x−μ)/2σ²)`` with the transcendental parts baked as
    literals, then log-frequency lookups (unseen → −1e30)."""
    neg = flit(_NEG)
    scores = []
    for k in range(len(model.class_labels)):
        s = flit(math.log(model.prior[k]) if model.prior[k] > 0 else _NEG)
        for i, colname in enumerate(num_cols):
            v = model.var[k][i] + 1e-9
            c = -0.5 * math.log(2.0 * math.pi * v)
            x = f"CAST({colname} AS DOUBLE)"
            s = (
                f"({s} + ({flit(c)} - ({x} - {flit(model.mean[k][i])}) * "
                f"({x} - {flit(model.mean[k][i])}) / {flit(2.0 * v)}))"
            )
        for j, colname in enumerate(cat_cols):
            log_map = {
                key: math.log(p) if p > 0 else _NEG
                for key, p in model.freq[k][j].items()
            }
            s = f"({s} + {_cat_case_sql(colname, log_map, neg)})"
        scores.append(s)
    return argmax_case_sql(scores, [int(x) for x in model.class_labels])


def qda_predict_sql(model, num_cols: list[str]) -> str:
    """Quadratic discriminant score xᵀQx + L·x + b as one flat expression
    (numeric features only): intercept, linear terms in column order,
    then quadratic terms row-major.  The catalog query evaluates the SAME
    string via ``F.expr`` on Spark, so both engines share one operator
    order and the scores are bit-identical (the pandas-UDF scorer in
    qda.py is the generic API; its einsum accumulation order is not
    specified cross-platform, so the exactness gate uses this form)."""
    m = len(num_cols)
    xs = [f"CAST({c} AS DOUBLE)" for c in num_cols]
    scores = []
    for k in range(len(model.class_labels)):
        s = flit(model.intercept[k])
        for i in range(m):
            s = f"({s} + ({flit(model.lin[k][i])} * {xs[i]}))"
        for i in range(m):
            for j in range(m):
                s = f"({s} + ({flit(model.quad[k][i, j])} * {xs[i]} * {xs[j]}))"
        scores.append(s)
    return argmax_case_sql(scores, [int(x) for x in model.class_labels])
