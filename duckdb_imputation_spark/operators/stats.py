"""Grouped statistical hypothesis testing — the analytics-engine face
of A/B comparison and categorical-association screening.

Both tests reduce to ONE conditional aggregate over one scan (no
window, no self-join, no per-key series): the t-test folds each
stratum's two cohorts into (n, sum, sum-of-squares) triples via
FILTER-style conditional aggregation; the chi-squared test builds the
contingency table with one GROUP BY and closes it against its own
(category-sized) marginals.  All moments are exact integer sums when
the value column is integral (the catalog rows feed cents), so two
engines disagree only in the final double division/sqrt — absorbed by
the stat-class rounding tier the profiler rows established.

Public-literature spec: Welch, "The generalization of 'Student's'
problem when several different population variances are involved",
Biometrika 1947 (the unequal-variance t-test with the
Welch–Satterthwaite degrees of freedom); Pearson's chi-squared test of
independence (Pearson 1900).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["welch_ttest", "chi2_independence"]


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    by_cols: Sequence[str] = (),
    round_digits: int | None = 4,
) -> DataFrame:
    """Two-sample Welch t-test of ``value_col`` between the
    ``group_a`` and ``group_b`` cohorts of ``group_col``, one test per
    ``by_cols`` stratum (no ``by_cols``: one global row).

    Returns (by_cols..., n_a, n_b, mean_a, mean_b, t_stat, dof):
    cohort sizes exact, means and the statistic rounded to
    ``round_digits``.  ``t_stat``/``dof`` are NULL when either cohort
    has fewer than two observations or both sample variances are zero
    (the test is undefined, not zero).  Welch's form assumes neither
    equal variances nor equal sizes — the safe default for metric
    comparisons; dof is Welch–Satterthwaite.

    Scale shape: ONE aggregate over one scan, conditional sums per
    cohort — output is |strata| rows; nothing about a stratum's size
    has to fit anywhere (six doubles of aggregation state per
    stratum).  Rows outside both cohorts are filtered before the
    aggregate (predicate-pushdown-friendly)."""
    keys = list(by_cols)
    v = F.col(value_col).cast("double")
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)

    def moments(cond, tag):
        vv = F.when(cond, v)
        return [
            F.count(vv).alias(f"n_{tag}"),
            F.sum(vv).alias(f"s_{tag}"),
            F.sum(vv * vv).alias(f"ss_{tag}"),
        ]

    agg = (
        df.where((in_a | in_b) & v.isNotNull())
        .groupBy(*keys)
        .agg(*moments(in_a, "a"), *moments(in_b, "b"))
    )

    def stats(tag):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}")
        ss = F.col(f"ss_{tag}")
        mean = s / n
        # sample variance (ddof=1)
        var = (ss - s * s / n) / (n - F.lit(1.0))
        return n, mean, var

    na, ma, va = stats("a")
    nb, mb, vb = stats("b")
    sea, seb = va / na, vb / nb
    se2 = sea + seb
    defined = (
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > F.lit(0.0))
    )
    t = F.when(defined, (ma - mb) / F.sqrt(se2))
    dof = F.when(
        defined,
        (se2 * se2)
        / (sea * sea / (na - F.lit(1.0)) + seb * seb / (nb - F.lit(1.0))),
    )
    mean_a, mean_b = ma, mb
    if round_digits is not None:
        mean_a = F.round(mean_a, round_digits)
        mean_b = F.round(mean_b, round_digits)
        t = F.round(t, round_digits)
        dof = F.round(dof, round_digits)
    return agg.select(
        *keys,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        t.alias("t_stat"),
        dof.alias("dof"),
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_digits: int | None = 4,
) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns: one output row (chi2, dof, n) where
    ``chi2 = sum (O - E)^2 / E`` over the FULL contingency table
    (unobserved cells contribute their expectation — built by closing
    the observed table against the cross join of its own marginals)
    and ``dof = (|A| - 1) * (|B| - 1)``.

    NULL categories are dropped (a missing label is not a level).

    Scale shape: ONE corpus-sized GROUP BY builds the observed table;
    everything after runs on frames no larger than the OBSERVED cell
    set.  The |A| x |B| closure is never materialized: unobserved
    cells contribute exactly their expectation, and those expectations
    sum to ``N - sum_observed(E)``, so

        chi2 = sum_observed((O - E)^2 / E - E) + N

    — two category-keyed equi-joins (marginals onto observed cells,
    AQE broadcasts them) plus one scalar attach, instead of a marginal
    cross product (which for vocabulary x domain categoricals would
    dwarf the observed table).  Counts are exact integers; the chi2
    sum is the one double-accumulation surface (stat-class
    rounding)."""
    a, b = F.col(col_a), F.col(col_b)
    obs = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    ra = obs.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    cb = obs.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    tot = obs.agg(F.sum("__o").cast("double").alias("__n"))
    cells = (
        obs.join(ra, "__a")
        .join(cb, "__b")
        .crossJoin(F.broadcast(tot))
        .select(
            "__a",
            "__b",
            "__n",
            F.col("__o").cast("double").alias("o"),
            (
                F.col("__ra").cast("double")
                * F.col("__cb").cast("double")
                / F.col("__n")
            ).alias("e"),
        )
    )
    chi2 = (
        F.sum(
            (F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))
            / F.col("e")
            - F.col("e")
        )
        + F.first("__n")
    )
    if round_digits is not None:
        chi2 = F.round(chi2, round_digits)
    return cells.agg(
        chi2.alias("chi2"),
        (
            (F.count_distinct("__a") - 1) * (F.count_distinct("__b") - 1)
        ).cast("long").alias("dof"),
        F.first("__n").cast("long").alias("n"),
    )
