"""Grouped statistical hypothesis testing — the analytics-engine face
of A/B comparison, categorical-association and distribution-shift
screening.

The moment-based tests (Welch t, chi-squared, one-way ANOVA) reduce
to ONE conditional aggregate over one scan (no window, no self-join,
no per-key series): each stratum folds to a handful of aggregation
doubles.  The rank-based tests (Spearman, Mann–Whitney U,
Kolmogorov–Smirnov) share a single scale discipline — the
**rank dictionary**: one corpus-sized GROUP BY collapses rows to
(stratum, value, count) cells, a per-stratum window prefix-sum over
the DISTINCT values assigns exact average ranks (doubled, so ties'
.5s stay integral), and everything downstream is dictionary-sized.
A stratum's task bound is therefore its distinct-VALUE count, not its
row count — bounded domains (cents, quantities, bucketed scores) make
the dictionaries tiny at any corpus size; for continuous unique-valued
data the dictionary degenerates to row-sized and the fused global
ranking family (operators/prefix.py) is the documented escape hatch.

All moments/ranks/tie-terms are exact integer sums when the value
column is integral (the catalog rows feed cents), carried in
DECIMAL(38,0), so two engines disagree only in the final double
division/sqrt — absorbed by the stat-class rounding tier the profiler
rows established.

Public-literature spec: Welch, Biometrika 1947 (unequal-variance t
with Welch–Satterthwaite dof); Pearson 1900 (chi-squared
independence); Spearman, Am. J. Psychol. 1904 (rank correlation, the
tied form = Pearson over average ranks); Mann & Whitney, Ann. Math.
Stat. 1947 (U statistic; normal approximation with the standard tie
correction, e.g. Lehmann, "Nonparametrics" 1975 §1.4); Kolmogorov
1933 / Smirnov 1939 (two-sample sup-distance of empirical CDFs);
Fisher's one-way analysis of variance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "welch_ttest",
    "chi2_independence",
    "spearman_corr",
    "mann_whitney_u",
    "auc_score",
    "auc_ovr",
    "ks_2sample",
    "anova_oneway",
    "benford_profile",
    "categorical_entropy",
]

_DEC = "decimal(38,0)"


def _dict_partition(keys: list[str], value_col: str) -> list:
    """Partition spec for a window over a DICTIONARY frame (one row per
    distinct value per stratum).  With strata: the stratum keys.  The
    GLOBAL case gets a constant-valued but NON-FOLDABLE key — one group,
    planned as a hash exchange instead of a SinglePartition funnel —
    because the frame is bounded by the distinct-VALUE count, not the
    corpus (same pattern as prefix.py's offsets window; the module
    docstring documents the bounded-domain premise and the prefix.py
    escape hatch for unique-valued data)."""
    if keys:
        return list(keys)
    return [F.pmod(F.xxhash64(F.col(value_col)), F.lit(1))]


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
    effect_size: bool = False,
) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns: one output row (chi2, dof, n) where
    ``chi2 = sum (O - E)^2 / E`` over the FULL contingency table
    (unobserved cells contribute their expectation — built by closing
    the observed table against the cross join of its own marginals)
    and ``dof = (|A| - 1) * (|B| - 1)``.

    NULL categories are dropped (a missing label is not a level).
    ``effect_size=True`` appends Cramér's V —
    ``sqrt(chi2 / (n · (min(|A|, |B|) − 1)))`` (Cramér 1946) — the
    sample-size-free association strength (chi2 grows with n even for
    a fixed weak association; V ∈ [0, 1] does not).  NULL when either
    categorical has a single level (no association is measurable).

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
    out = cells.agg(
        chi2.alias("chi2"),
        (
            (F.count_distinct("__a") - 1) * (F.count_distinct("__b") - 1)
        ).cast("long").alias("dof"),
        F.first("__n").cast("long").alias("n"),
        F.least(F.count_distinct("__a"), F.count_distinct("__b")).alias(
            "__minlv"
        ),
    )
    if not effect_size:
        return out.drop("__minlv")
    v = F.when(
        F.col("__minlv") >= 2,
        F.sqrt(
            F.col("chi2")
            / (F.col("n").cast("double") * (F.col("__minlv") - 1.0))
        ),
    )
    if round_digits is not None:
        v = F.round(v, round_digits)
    return out.select("chi2", "dof", "n", v.alias("cramers_v"))


def _cohort_dictionary(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    keys: list[str],
    with_ranks: bool = True,
) -> DataFrame:
    """Collapse two cohorts to the shared rank dictionary: one row per
    (stratum, distinct value) with per-cohort counts ``__ca``/``__cb``
    and — when ``with_ranks`` — the doubled average rank ``__r2`` of
    that value in the COMBINED per-stratum sample (2*avg_rank =
    2*prefix + t + 1, an exact integer even under ties).  The window
    runs over the dictionary, not the rows.  Callers that only need
    the per-value cohort counts (KS builds its own inclusive prefix
    sums) pass ``with_ranks=False`` and skip the rank window's
    dictionary-sized sort/exchange entirely (ADVICE r8)."""
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    v = F.col(value_col)
    d = (
        df.where((in_a | in_b) & v.isNotNull())
        .groupBy(*keys, v.alias("__v"))
        .agg(
            F.sum(F.when(in_a, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(in_b, 1).otherwise(0)).alias("__cb"),
        )
    )
    if not with_ranks:
        return d
    w = Window.partitionBy(*_dict_partition(keys, "__v")).orderBy("__v")
    t = F.col("__ca") + F.col("__cb")
    prefix = F.coalesce(
        F.sum(t).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return d.withColumn("__r2", 2 * prefix + t + 1)


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by_cols: Sequence[str] = (),
    round_digits: int | None = 4,
) -> DataFrame:
    """Spearman rank correlation of ``x_col`` vs ``y_col`` per
    ``by_cols`` stratum (no ``by_cols``: one global row).  Ties get
    average ranks (the standard tied form: Pearson correlation over
    the rank vectors).  Returns (by_cols..., n, rho); rho is NULL
    when n < 2 or either column is constant in the stratum.

    Scale shape: rows collapse to one rank DICTIONARY per column
    (GROUP BY (stratum, value) → window prefix over distinct values
    only), then join back — two equi-joins that AQE broadcasts when
    the value domains are bounded — and ONE final aggregate of six
    DECIMAL(38,0) sums.  Doubled ranks keep tie-averages integral, so
    every sum is exact; the single double surface is the final
    covariance/σσ division (stat-class ROUND).  Per-stratum task
    bound = distinct-value count; for unique-valued continuous data
    prefer bucketing or the global ranking family (prefix.py)."""
    keys = list(by_cols)
    rows = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*keys, F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))

    def rank_dict(col: str, out: str) -> DataFrame:
        d = rows.groupBy(*keys, col).agg(F.count(F.lit(1)).alias("__t"))
        w = Window.partitionBy(*_dict_partition(keys, col)).orderBy(col)
        prefix = F.coalesce(
            F.sum("__t").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        return d.select(
            *keys, col, (2 * prefix + F.col("__t") + 1).alias(out)
        )

    ranked = rows.join(rank_dict("__x", "__rx"), [*keys, "__x"]).join(
        rank_dict("__y", "__ry"), [*keys, "__y"]
    )
    rx = F.col("__rx").cast(_DEC)
    ry = F.col("__ry").cast(_DEC)
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rx).alias("__sx"),
        F.sum(ry).alias("__sy"),
        F.sum(rx * rx).alias("__sxx"),
        F.sum(ry * ry).alias("__syy"),
        F.sum(rx * ry).alias("__sxy"),
    )
    n = F.col("n").cast(_DEC)
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    dx = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    dy = (n * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    rho = F.when(
        (F.col("n") >= 2) & (dx > 0.0) & (dy > 0.0),
        num / F.sqrt(dx * dy),
    )
    if round_digits is not None:
        rho = F.round(rho, round_digits)
    return agg.select(*keys, F.col("n").cast("long").alias("n"), rho.alias("rho"))


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    by_cols: Sequence[str] = (),
    round_digits: int | None = 4,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test of ``value_col``
    between the ``group_a`` and ``group_b`` cohorts, one test per
    ``by_cols`` stratum.  Returns (by_cols..., n_a, n_b, u_stat,
    z_stat): ``u_stat`` is cohort A's U (exact, half-integral under
    ties), ``z_stat`` the normal approximation with the standard tie
    correction — NULL when either cohort is empty or the tie-corrected
    variance is zero (all values identical).  No continuity
    correction (documented choice; both engines agree by
    construction).

    Scale shape: rows collapse to the combined rank dictionary (one
    GROUP BY + one window over DISTINCT values per stratum) and the
    rank-sum folds directly off the dictionary — cohort counts weight
    the doubled average ranks, so there is NO join back to rows at
    all.  Everything after the first GROUP BY is dictionary-sized.
    Rank sums and the tie term Σ(t³−t) are exact DECIMAL(38,0)
    integers; z's division/sqrt is the one double surface."""
    keys = list(by_cols)
    d = _cohort_dictionary(df, group_col, value_col, group_a, group_b, keys)
    ca = F.col("__ca").cast(_DEC)
    t = (F.col("__ca") + F.col("__cb")).cast(_DEC)
    r2 = F.col("__r2").cast(_DEC)
    agg = d.groupBy(*keys).agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum("__cb").cast("long").alias("n_b"),
        F.sum(ca * r2).alias("__r2a"),
        F.sum(t * t * t - t).alias("__ties"),
    )
    na = F.col("n_a").cast(_DEC)
    nb = F.col("n_b").cast(_DEC)
    nn = na + nb
    u2 = (F.col("__r2a") - na * (na + 1)).cast("double")  # 2*U_a
    mu2 = (na * nb).cast("double")  # 2*E[U]
    nd = nn.cast("double")
    var = F.when(
        nn >= 2,
        (na * nb).cast("double")
        / 12.0
        * (
            (nd + 1.0)
            - F.col("__ties").cast("double") / (nd * (nd - 1.0))
        ),
    )
    z = F.when(
        (F.col("n_a") >= 1) & (F.col("n_b") >= 1) & (var > 0.0),
        (u2 - mu2) / (2.0 * F.sqrt(var)),
    )
    if round_digits is not None:
        z = F.round(z, round_digits)
    return agg.select(
        *keys,
        "n_a",
        "n_b",
        (u2 / 2.0).alias("u_stat"),
        z.alias("z_stat"),
    )


def auc_score(
    df: DataFrame,
    label_col: str,
    score_col: str,
    positive=1,
    negative=0,
    by_cols: Sequence[str] = (),
    round_digits: int | None = 6,
) -> DataFrame:
    """ROC-AUC of ``score_col`` as a ranking of the binary
    ``label_col`` (``positive`` vs ``negative`` classes), one row per
    ``by_cols`` stratum — the standard in-engine evaluation metric for
    any scoring model (the quality classifier, logreg scores, BM25
    relevance, novelty): AUC = P(score(pos) > score(neg)) +
    ½·P(score(pos) = score(neg)), which is exactly the normalized
    Mann–Whitney statistic U/(n_pos·n_neg) under average ranks
    (Hanley & McNeil, Radiology 1982 — the rank-sum identity; ties get
    the trapezoidal ½ credit).  Returns (by_cols..., n_pos, n_neg,
    auc); auc is NULL when either class is empty in the stratum.
    Rows with a NULL score, or whose label is neither ``positive`` nor
    ``negative``, are excluded (the two-cohort contract shared with
    mann_whitney_u).

    Scale shape: the shared rank-dictionary discipline — one GROUP BY
    collapses rows to (stratum, score, class-counts) cells, a window
    prefix over DISTINCT scores assigns doubled average ranks, and the
    rank-sum folds off the dictionary with NO join back to rows.
    2·R_pos and n_pos(n_pos+1) are exact DECIMAL(38,0) integers, so
    AUC's single double surface is the final division — cross-engine
    agreement to the rounding tier is by construction, not by
    tolerance."""
    keys = list(by_cols)
    d = _cohort_dictionary(
        df, label_col, score_col, positive, negative, keys
    )
    ca = F.col("__ca").cast(_DEC)
    r2 = F.col("__r2").cast(_DEC)
    agg = d.groupBy(*keys).agg(
        F.sum("__ca").cast("long").alias("n_pos"),
        F.sum("__cb").cast("long").alias("n_neg"),
        F.sum(ca * r2).alias("__r2p"),
    )
    np_ = F.col("n_pos").cast(_DEC)
    nn_ = F.col("n_neg").cast(_DEC)
    # 2*U_pos = 2*R_pos - n_pos*(n_pos+1); AUC = 2U / (2 n_pos n_neg)
    auc = F.when(
        (F.col("n_pos") >= 1) & (F.col("n_neg") >= 1),
        (F.col("__r2p") - np_ * (np_ + 1)).cast("double")
        / (2.0 * (np_ * nn_).cast("double")),
    )
    if round_digits is not None:
        auc = F.round(auc, round_digits)
    return agg.select(*keys, "n_pos", "n_neg", auc.alias("auc"))


def auc_ovr(
    df: DataFrame,
    label_col: str,
    class_scores: Sequence[tuple],
    round_digits: int | None = 6,
) -> DataFrame:
    """One-vs-rest ROC-AUC for a MULTICLASS label (VERDICT r9 #5 — the
    FineWeb-Edu quality-tier shape): for each ``(class_value,
    score_col)`` pair in ``class_scores``, the binary ``auc_score`` of
    that class's score ranking class-vs-rest, returned as one row per
    class — (class, n_pos, n_neg, auc).  ``score_col`` may be a column
    name or a Column expression (each class's model emits its own
    score, so one shared score column cannot rank all classes —
    multiclass AUC is inherently per-class-scored).  Rows with a NULL
    label are excluded everywhere; rows with a NULL score are excluded
    from that class's ranking (auc_score's contract).

    Scale shape: C independent rank-dictionary passes — each is the
    binary discipline unchanged (one GROUP BY to (score, class-count)
    cells, a window over DISTINCT scores, exact DECIMAL rank sums, no
    join back to rows) — UNIONed as C dictionary-bounded 1-row-ish
    frames.  The C passes cannot share one dictionary because each
    class ranks by a DIFFERENT score column; at 100 TB this is C
    map-side-combined aggregates over the same scan (cache the scored
    frame upstream if C is large)."""
    class_scores = list(class_scores)
    if not class_scores:
        raise ValueError("auc_ovr: no (class, score) pairs declared")
    lab = F.col(label_col)
    frames = []
    for cls, score in class_scores:
        sc = F.col(score) if isinstance(score, str) else score
        d = df.where(lab.isNotNull()).select(
            F.when(lab == F.lit(cls), F.lit(1))
            .otherwise(F.lit(0))
            .alias("__y"),
            sc.alias("__s"),
        )
        a = auc_score(
            d, "__y", "__s", positive=1, negative=0, round_digits=None
        )
        auc = F.col("auc")
        if round_digits is not None:
            auc = F.round(auc, round_digits)
        frames.append(
            a.select(
                F.lit(str(cls)).alias("class"),
                "n_pos",
                "n_neg",
                auc.alias("auc"),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out


def ks_2sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    by_cols: Sequence[str] = (),
    round_digits: int | None = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic of ``value_col``
    between the ``group_a`` and ``group_b`` cohorts per ``by_cols``
    stratum: D = sup_v |ECDF_a(v) − ECDF_b(v)|.  Returns
    (by_cols..., n_a, n_b, d_stat); NULL when either cohort is empty.

    Scale shape: the same combined rank dictionary (GROUP BY + one
    window over distinct values per stratum) carries INCLUSIVE
    per-cohort prefix counts; D is evaluated cross-multiplied —
    max |ca·n_b − cb·n_a| over exact DECIMAL integers — so the max is
    deterministic and the single final division of two exact integers
    is bit-identical across engines (rounding is display only).
    Nothing after the first GROUP BY exceeds dictionary size."""
    keys = list(by_cols)
    # with_ranks=False: KS builds its own inclusive prefix sums below
    # and never reads __r2 — skip that rank window's sort (ADVICE r8).
    d = _cohort_dictionary(
        df, group_col, value_col, group_a, group_b, keys, with_ranks=False
    )
    w = Window.partitionBy(*_dict_partition(keys, "__v")).orderBy("__v")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    whole = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = d.select(
        *keys,
        F.sum("__ca").over(run).cast(_DEC).alias("__cca"),
        F.sum("__cb").over(run).cast(_DEC).alias("__ccb"),
        F.sum("__ca").over(whole).cast(_DEC).alias("__na"),
        F.sum("__cb").over(whole).cast(_DEC).alias("__nb"),
    )
    gap = F.abs(
        F.col("__cca") * F.col("__nb") - F.col("__ccb") * F.col("__na")
    )
    agg = cum.groupBy(*keys).agg(
        F.max(F.col("__na")).cast("long").alias("n_a"),
        F.max(F.col("__nb")).cast("long").alias("n_b"),
        F.max(gap).alias("__gap"),
    )
    d_stat = F.when(
        (F.col("n_a") >= 1) & (F.col("n_b") >= 1),
        F.col("__gap").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
    )
    if round_digits is not None:
        d_stat = F.round(d_stat, round_digits)
    return agg.select(*keys, "n_a", "n_b", d_stat.alias("d_stat"))


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
    by_cols: Sequence[str] = (),
    round_digits: int | None = 4,
) -> DataFrame:
    """One-way analysis of variance of ``value_col`` across the
    levels of ``group_col``, one F per ``by_cols`` stratum.  Returns
    (by_cols..., k_groups, n, ss_between, ss_within, f_stat); the
    statistic is NULL when fewer than two levels, no residual degrees
    of freedom (n ≤ k), or zero within-group variance.

    Scale shape: ONE GROUP BY (stratum, level) folds rows to (n, Σv,
    Σv²) triples, then ONE level-frame aggregate per stratum — output
    is |strata| rows and nothing level- or stratum-sized ever sits in
    one task.  Per-level moments are exact integer sums for integral
    values; the cross-level Σ(sᵢ²/nᵢ) is the double-accumulation
    surface (stat-class ROUND, same class as chi-squared's cell
    sum)."""
    keys = list(by_cols)
    v = F.col(value_col).cast("double")
    lv = (
        df.where(v.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(*keys, F.col(group_col).alias("__g"))
        .agg(
            F.count(v).cast("double").alias("__n"),
            F.sum(v).alias("__s"),
            F.sum(v * v).alias("__ss"),
        )
    )
    agg = lv.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("__n").alias("__nn"),
        F.sum("__s").alias("__grand"),
        F.sum("__ss").alias("__sstot"),
        F.sum(F.col("__s") * F.col("__s") / F.col("__n")).alias("__sgrp"),
    )
    nn = F.col("__nn")
    k = F.col("k_groups").cast("double")
    ssb = F.col("__sgrp") - F.col("__grand") * F.col("__grand") / nn
    ssw = F.col("__sstot") - F.col("__sgrp")
    f_stat = F.when(
        (F.col("k_groups") >= 2) & (nn > k) & (ssw > 0.0),
        (ssb / (k - 1.0)) / (ssw / (nn - k)),
    )
    out_ssb, out_ssw = ssb, ssw
    if round_digits is not None:
        out_ssb = F.round(out_ssb, round_digits)
        out_ssw = F.round(out_ssw, round_digits)
        f_stat = F.round(f_stat, round_digits)
    return agg.select(
        *keys,
        "k_groups",
        nn.cast("long").alias("n"),
        out_ssb.alias("ss_between"),
        out_ssw.alias("ss_within"),
        f_stat.alias("f_stat"),
    )


def benford_profile(
    df: DataFrame,
    value_col: str,
    by_cols: Sequence[str] = (),
    round_digits: int | None = 4,
) -> DataFrame:
    """First-digit (Benford's law) profile per stratum — the
    synthetic-data / fraud / unit-mixup screen: naturally occurring
    multi-scale magnitudes follow P(d) = log₁₀(1 + 1/d) (Newcomb 1881;
    Benford 1938); fabricated or truncated distributions don't.

    Takes POSITIVE INTEGRAL values (cents, counts; zero/negative/NULL
    rows are excluded — Benford applies to positive magnitudes).  A
    non-integral column type raises ``ValueError`` up front (ADVICE
    r8): a fractional value like 0.53 would pass the v>0 filter yet
    string-extract digit 0, silently poisoning expected_p with
    log(1+1/0) = ∞ — scale to an integer tier (cents) first.
    Returns one row per (stratum, observed first digit):
    (by_cols..., digit, cnt, obs_p, expected_p, chi2) where ``chi2``
    is the stratum's 9-cell goodness-of-fit statistic (constant
    within a stratum; dof = 8).  Digits unobserved in a stratum are
    not materialized — their (O−E)²/E = E terms fold in algebraically
    (chi2 = Σ_obs((O−E)²/E) + n − Σ_obs E, the chi-squared closure).

    The first digit comes from the DECIMAL STRING of the integer —
    pure string ops, zero float boundary cross-engine (a log10-based
    extraction would be transcendental per row); only expected_p and
    the chi2 sum touch ln (stat-class ROUND).

    Scale shape: ONE GROUP BY (stratum, digit) — ≤ 9 cells per
    stratum — plus a |strata|-row broadcast totals join."""
    _INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
    dtype = dict(df.dtypes).get(value_col)
    if dtype is not None and dtype not in _INTEGRAL and not (
        dtype.startswith("decimal") and dtype.endswith(",0)")
    ):
        raise ValueError(
            f"benford_profile needs an integral value column; "
            f"{value_col!r} is {dtype} — scale to an integer tier "
            f"(e.g. cents) first, a fractional first-significant-"
            f"digit extraction is not defined here"
        )
    keys = list(by_cols)
    v = F.col(value_col)
    d = (
        df.where(v.isNotNull() & (v > 0))
        .groupBy(
            *keys,
            F.substring(v.cast("string"), 1, 1).cast("int").alias("digit"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = d.groupBy(*keys).agg(F.sum("cnt").alias("__n"))
    j = (
        d.join(F.broadcast(totals), keys)
        if keys
        else d.crossJoin(F.broadcast(totals))
    )
    nn = F.col("__n").cast("double")
    # log10(1 + 1/d) = ln(1 + 1/d) / ln(10)
    exp_p = F.log(1.0 + 1.0 / F.col("digit").cast("double")) / F.log(
        F.lit(10.0)
    )
    e = nn * exp_p
    o = F.col("cnt").cast("double")
    cell = (o - e) * (o - e) / e
    withcells = j.select(
        *keys, "digit", "cnt", "__n",
        exp_p.alias("__ep"), cell.alias("__cell"), e.alias("__e"),
    )
    chi = withcells.groupBy(*keys).agg(
        (F.sum("__cell") + F.first(F.col("__n").cast("double"))
         - F.sum("__e")).alias("__chi2")
    )
    out = (
        withcells.join(F.broadcast(chi), keys)
        if keys
        else withcells.crossJoin(F.broadcast(chi))
    )
    obs_p = F.col("cnt").cast("double") / F.col("__n").cast("double")
    ep, chi2 = F.col("__ep"), F.col("__chi2")
    if round_digits is not None:
        obs_p = F.round(obs_p, round_digits)
        ep = F.round(ep, round_digits)
        chi2 = F.round(chi2, round_digits)
    return out.select(
        *keys,
        "digit",
        F.col("cnt").cast("long").alias("cnt"),
        obs_p.alias("obs_p"),
        ep.alias("expected_p"),
        chi2.alias("chi2"),
    )


def categorical_entropy(
    df: DataFrame,
    value_col: str,
    by_cols: Sequence[str] = (),
    round_digits: int | None = 6,
) -> DataFrame:
    """Shannon entropy of a categorical column per stratum — the
    class-balance / label-diversity screen (Shannon 1948):

        H = −Σ_levels p·ln(p)        (nats)
        H_norm = H / ln(k)           (∈ [0, 1]; 1 = uniform)

    Returns (by_cols..., n, k_levels, entropy, entropy_norm);
    ``entropy_norm`` is NULL for a single-level stratum (ln(1) = 0 —
    balance is undefined, not perfect).  NULL values are dropped (a
    missing label is not a level).

    Scale shape: ONE corpus GROUP BY (stratum, level) + one
    level-frame fold per stratum — output is |strata| rows and the
    intermediate is the observed level set, never row-sized.  Counts
    exact; the level-frame Σ p·ln(p) is the transcendental surface
    (stat-class ROUND)."""
    keys = list(by_cols)
    v = F.col(value_col)
    lv = (
        df.where(v.isNotNull())
        .groupBy(*keys, v.alias("__lv"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    totals = lv.groupBy(*keys).agg(F.sum("__c").alias("__n"))
    j = (
        lv.join(F.broadcast(totals), keys)
        if keys
        else lv.crossJoin(F.broadcast(totals))
    )
    p = F.col("__c").cast("double") / F.col("__n").cast("double")
    agg = j.groupBy(*keys).agg(
        F.first("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k_levels"),
        (-F.sum(p * F.log(p))).alias("__h"),
    )
    h = F.col("__h")
    h_norm = F.when(
        F.col("k_levels") >= 2,
        h / F.log(F.col("k_levels").cast("double")),
    )
    if round_digits is not None:
        h = F.round(h, round_digits)
        h_norm = F.round(h_norm, round_digits)
    return agg.select(
        *keys, "n", "k_levels", h.alias("entropy"), h_norm.alias("entropy_norm")
    )
