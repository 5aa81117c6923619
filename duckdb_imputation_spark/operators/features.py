"""Feature engineering for tabular ML — categorical encodings that the
imputation/regression family (ml/) consumes upstream.

Target encoding follows the standard smoothed empirical-Bayes form
(Micci-Barreca, SIGKDD Explorations 2001): a category's code shrinks
toward the global prior by a pseudo-count ``m``, so rare categories
don't memorize their few targets.  The leave-one-out variant excludes
the row's OWN target from its code — the training-time form that
avoids target leakage (each training row is encoded as if it were a
held-out point); at inference time use ``loo=False`` with the
dictionary fit on training data.

Everything is exact-sum arithmetic: the encoder dictionary is one
GROUP BY (category → n, Σy), the prior one scalar aggregate, and each
row's code ONE division of exact sums — bit-identical cross-engine
for integral targets (cents), no rounding tier needed beyond display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["target_encode", "collapse_rare_categories"]


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
    loo: bool = False,
    out_col: str = "te",
    round_digits: int | None = 6,
) -> DataFrame:
    """Append ``out_col`` — the smoothed target encoding of
    ``cat_col``:

        te(c)       = (Σ_c y + m·prior) / (n_c + m)
        te_loo(row) = (Σ_c y − y_row + m·prior) / (n_c − 1 + m)

    with ``prior`` the global target mean and ``m = smoothing`` the
    shrinkage pseudo-count (Micci-Barreca 2001).  ``loo=True`` is the
    training-time leakage-safe form; a singleton category under LOO
    falls back to the prior exactly (its only evidence IS the row's
    own target).  Rows with NULL target get the non-LOO code (nothing
    to leak); rows with NULL category get the prior.

    Scale shape: the encoder dictionary is |categories| rows (ONE
    GROUP BY, map-side combined), joined back broadcast; the prior is
    a 1-row broadcast.  The corpus is touched twice (dictionary +
    encode) and never shuffled on the category key for the encode —
    the join ships the dictionary to the data."""
    y = F.col(target_col).cast("double")
    m = float(smoothing)
    d = (
        df.where(F.col(cat_col).isNotNull() & y.isNotNull())
        .groupBy(F.col(cat_col).alias("__cat"))
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(y).alias("__s"))
    )
    prior = df.where(y.isNotNull()).agg(
        (F.sum(y) / F.count(y)).alias("__prior")
    )
    j = df.join(
        F.broadcast(d), df[cat_col] == F.col("__cat"), "left"
    ).crossJoin(F.broadcast(prior))
    n_c = F.coalesce(F.col("__n").cast("double"), F.lit(0.0))
    s_c = F.coalesce(F.col("__s"), F.lit(0.0))
    p = F.col("__prior")
    plain = (s_c + F.lit(m) * p) / (n_c + F.lit(m))
    if loo:
        # Guard the m=0 singleton: n_c−1+m = 0 would be a silent 0/0
        # NULL; the documented semantics (a singleton's only LOO
        # evidence is the row's own target) is the prior (ADVICE r8).
        loo_den = n_c - 1.0 + F.lit(m)
        loo_code = F.when(
            loo_den > 0.0, (s_c - y + F.lit(m) * p) / loo_den
        ).otherwise(p)
        code = F.when(y.isNotNull() & (n_c >= 1.0), loo_code).otherwise(
            plain
        )
    else:
        code = plain
    code = F.when(F.col(cat_col).isNotNull(), code).otherwise(p)
    if round_digits is not None:
        code = F.round(code, round_digits)
    return j.select(*df.columns, code.alias(out_col))


def collapse_rare_categories(
    df: DataFrame,
    cat_col: str,
    min_count: int = 10,
    other_label: str = "__other__",
    out_col: str | None = None,
) -> DataFrame:
    """Replace categories observed fewer than ``min_count`` times with
    ``other_label`` — the long-tail collapse that precedes one-hot /
    dictionary encodings (an unseen-at-inference category maps to the
    same bucket as the training tail).  NULL stays NULL (a missing
    label is not a rare label).  Writes in place unless ``out_col``
    is given.

    Scale shape: ONE GROUP BY builds the KEEP dictionary (frequent
    categories only — smaller than the category vocabulary), joined
    back broadcast; rows never shuffle."""
    out = out_col or cat_col
    keep = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(F.col(cat_col).alias("__keep_cat"))
        .agg(F.count(F.lit(1)).alias("__kc"))
        .where(F.col("__kc") >= min_count)
        .select("__keep_cat")
    )
    j = df.join(
        F.broadcast(keep), df[cat_col] == F.col("__keep_cat"), "left"
    )
    col = F.when(F.col(cat_col).isNull(), F.lit(None).cast("string")).when(
        F.col("__keep_cat").isNotNull(), F.col(cat_col).cast("string")
    ).otherwise(F.lit(other_label))
    out_cols = [
        col.alias(out) if c == out else F.col(c) for c in df.columns
    ]
    if out not in df.columns:
        out_cols.append(col.alias(out))
    return j.select(*out_cols)
