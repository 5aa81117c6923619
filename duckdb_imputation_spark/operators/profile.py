"""Table profiling — the DuckDB ``SUMMARIZE`` surface, Spark-first.

DuckDB users lean on ``SUMMARIZE t`` for instant per-column
statistics (count, nulls, distincts, min/max, mean/std, quartiles).
The Spark-native translation is NOT per-column queries (k scans) and
NOT a driver loop: it is ONE wide aggregation — every column's
statistics as sibling aggregate expressions in a single partial+final
pass over ONE scan (verified on the executed plan: one FileScan, zero
joins, for any column count; Catalyst folds the per-column exact
COUNT(DISTINCT) family into the same pass via Expand) — followed by
an unpivot of the single result row into (column, stats...) rows.
``exact_distinct=False`` swaps the distinct counts for HyperLogLog
``approx_count_distinct``, trading exactness for the Expand's
per-distinct-column row multiplication, and ``exact_quantiles=False``
swaps the exact ``percentile`` quartiles for ``approx_percentile``
(a bounded-memory KLL-class sketch) — exact ``percentile`` buffers
EVERY value of each numeric column in one ungrouped aggregation
state, an OOM at corpus scale with no partial aggregation to save it
(VERDICT r7 #2).  Both knobs off is the right profile at corpus
scale; the exact defaults are the oracle surface.

Cross-engine determinism notes (the oracle discipline):

* quantiles use Spark's EXACT ``percentile`` (linear interpolation),
  which matches DuckDB's ``quantile_cont`` definition bit-for-bit on
  the same multiset;
* ``n_distinct`` is exact (``count_distinct``) — the profile is a
  correctness surface here, approximate profiling at corpus scale is
  :func:`..operators.sketches.distinct_sketch`'s job;
* min/max are emitted as strings (mixed column types share one
  schema, the SUMMARIZE convention) — numeric formatting is
  normalized through a float cast with explicit rounding on both
  engines;
* mean/std/quantile cells are second-moment-class statistics — the
  catalog row rounds them at the repo's ROUND(,4)+0.0 tier
  (oracle_margin.py's stat-class rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "profile_table",
    "grouped_robust_stats",
    "grouped_winsorize",
    "json_key_profile",
    "grouped_moments",
    "quantile_buckets",
]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
    exact_quantiles: bool = True,
) -> DataFrame:
    """Per-column statistics as rows:

    (column, count, n_null, n_distinct, min_value, max_value,
     mean, std, q25, q50, q75)

    ``min_value``/``max_value`` are strings for every column type;
    mean/std/quartiles are NULL for non-numeric columns.  One
    aggregation pass over one scan; the unpivot runs on the single
    aggregated row."""
    names = list(cols) if cols is not None else list(df.columns)
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in names:
        col = F.col(c)
        is_num = isinstance(fields[c], _NUMERIC)
        aggs.append(F.count(col).alias(f"__cnt_{c}"))
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nul_{c}"))
        nd = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs.append(nd.alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
        if is_num:
            d = col.cast("double")
            qfn = "percentile" if exact_quantiles else "approx_percentile"
            aggs.append(F.avg(d).alias(f"__avg_{c}"))
            aggs.append(F.stddev_pop(d).alias(f"__std_{c}"))
            aggs.append(
                F.expr(
                    f"{qfn}(CAST({c} AS DOUBLE), array(0.25, 0.5, 0.75))"
                ).alias(f"__q_{c}")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__avg_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__std_{c}"))
            aggs.append(
                F.lit(None).cast("array<double>").alias(f"__q_{c}")
            )
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__cnt_{c}").cast("long").alias("count"),
            F.col(f"__nul_{c}").cast("long").alias("n_null"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
            F.col(f"__avg_{c}").alias("mean"),
            F.col(f"__std_{c}").alias("std"),
            F.element_at(f"__q_{c}", 1).alias("q25"),
            F.element_at(f"__q_{c}", 2).alias("q50"),
            F.element_at(f"__q_{c}", 3).alias("q75"),
        )
        for c in names
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("__p")
    ).select("__p.*")


def json_key_profile(
    df: DataFrame,
    json_col: str,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile a semi-structured JSON column's KEY SPACE — the first
    question against a scraped/ingested corpus with freeform metadata
    ("which keys exist, how often, how varied are the values"):

    one row per top-level key:
    (key, n_present, n_distinct_values, min_value, max_value)

    where values are compared as strings (scalars in their JSON text
    form, unquoted; nested objects/arrays as their JSON text).
    Malformed JSON and NULL rows contribute nothing (``from_json``
    yields NULL, ``explode_outer`` keeps the row but the NULL key is
    filtered — so the operator never throws on dirty data).

    ``exact_distinct=False`` swaps the per-key COUNT(DISTINCT) for the
    HyperLogLog sketch (same knob, same reason as
    :func:`profile_table`).

    Scale shape: ONE narrow scan (from_json to ``map<string,string>``
    + one explode — no Python, no schema inference pass over the
    corpus) feeding ONE keyed partial+final aggregate on the key
    (key cardinality is the metadata vocabulary — tiny); no window,
    no join."""
    kv = df.select(
        F.explode_outer(
            F.from_json(F.col(json_col), "map<string,string>")
        ).alias("key", "value")
    ).where(F.col("key").isNotNull())
    nd = (
        F.count_distinct("value")
        if exact_distinct
        else F.approx_count_distinct("value")
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        nd.cast("long").alias("n_distinct_values"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def grouped_robust_stats(
    df: DataFrame,
    value_col: str,
    by_cols: Sequence[str],
    k: float = 3.0,
    consistency: float = 1.4826,
    exact: bool = True,
    via_sort: bool = False,
) -> DataFrame:
    """Per-group robust location/scale + outlier screen: median, MAD
    (median absolute deviation) and the count of rows beyond
    ``k * consistency * MAD`` of the median — the robust-z / Hampel
    rule, the outlier filter a mean/std screen gets wrong the moment
    the outliers themselves inflate the std.  ``consistency=1.4826``
    rescales MAD to the std of a normal (the usual convention), so
    ``k=3`` reads as "3 robust sigmas".

    Returns one row per group:
    (by_cols..., n, med, mad, n_outliers).

    NULLs: ``n`` counts every row of the group (SQL COUNT(*)); the
    medians ignore NULL values and a NULL value is never an outlier —
    the same answers a SQL twin's quantile_cont/CASE WHEN gives.
    Rows whose GROUP key is NULL drop out (the equi-join back cannot
    match them), matching an inner-join SQL twin.

    Semantics and determinism: medians are Spark's EXACT interpolated
    ``percentile`` (bit-identical to DuckDB ``quantile_cont``); the
    threshold is evaluated as ``(k * consistency) * mad`` with the
    identical double constant-fold on any SQL twin, so the outlier
    comparison is deterministic cross-engine.  ``exact=False`` swaps
    both medians for ``approx_percentile`` — the corpus-scale profile
    (exact ``percentile`` buffers a group's values in the aggregation
    state, which is the right tool for the oracle surface and wrong at
    a billion rows per group).

    Scale shape (default): two grouped aggregates over the value column
    plus two joins against group-sized frames (AQE broadcasts them) —
    no window, no global sort; each pass is a partial+final aggregate
    keyed by the group columns.  ``via_sort=True`` (exact mode only)
    swaps each percentile aggregate for a per-GROUP window sort + the
    two middle order statistics: the values are BIT-IDENTICAL (same
    ``a + (b - a) * 0.5`` interpolation), but the sort spills to disk
    where ``percentile`` buffers the group's values in aggregation
    memory — the exact-and-huge-groups profile (the 10× rehearsal
    measured the buffer path superlinear precisely because its groups
    grew 10× each)."""
    by = list(by_cols)
    if not by:
        raise ValueError("by_cols must be non-empty")
    v = F.col(value_col).cast("double")
    q = "percentile" if exact else "approx_percentile"

    def _median(frame: DataFrame, col: str, out: str) -> DataFrame:
        if exact and via_sort:
            return _sorted_group_median(frame, col, by, out)
        return frame.groupBy(*by).agg(
            F.expr(f"{q}(CAST({col} AS DOUBLE), 0.5)").alias(out)
        )

    med = _median(df, value_col, "__med")
    dev = (
        df.join(med, by)
        .withColumn("__ad", F.abs(v - F.col("__med")))
    )
    if exact and via_sort:
        mad = _sorted_group_median(dev, "__ad", by, "mad").join(
            med.withColumnRenamed("__med", "med"), by
        )
    else:
        # med rides the SAME aggregate (min of the constant-per-group
        # column) — one fewer join than a separate med frame would cost
        mad = dev.groupBy(*by).agg(
            F.min("__med").alias("med"),
            F.expr(f"{q}(__ad, 0.5)").alias("mad"),
        )
    thresh = F.lit(float(k) * float(consistency)) * F.col("mad")
    return (
        dev.join(mad, by)
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(F.col("__ad") > thresh, 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


def grouped_winsorize(
    df: DataFrame,
    value_col: str,
    by_cols: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorize (quantile-clip) ``value_col`` within each group: values
    below the group's ``lower`` quantile rise to it, values above the
    ``upper`` quantile fall to it — the standard heavy-tail tamer for
    features feeding regressions/embeddings, and the companion to
    :func:`grouped_robust_stats` (that one COUNTS the tail, this one
    CAPS it).  Returns every input row with ``out_col`` (default
    ``<value_col>_wins``) attached; NULL values stay NULL.

    Quantiles are Spark's exact interpolated ``percentile``
    (bit-identical to DuckDB ``quantile_cont``); ``exact=False`` swaps
    ``approx_percentile`` in for corpus scale (exact buffers a group's
    values in the aggregate state).

    Scale shape: one grouped aggregate for the two cut points + one
    join back against the group-sized cut frame (AQE broadcasts it) +
    a codegen'd clamp — no window, no sort."""
    by = list(by_cols)
    if not by:
        raise ValueError("by_cols must be non-empty")
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError("need 0 <= lower < upper <= 1")
    out = out_col or f"{value_col}_wins"
    q = "percentile" if exact else "approx_percentile"
    cuts = df.groupBy(*by).agg(
        F.expr(
            f"{q}(CAST({value_col} AS DOUBLE), array({lower}, {upper}))"
        ).alias("__qs")
    ).select(
        *by,
        F.element_at("__qs", 1).alias("__lo"),
        F.element_at("__qs", 2).alias("__hi"),
    )
    v = F.col(value_col).cast("double")
    # explicit NULL guard: Spark's greatest/least SKIP nulls (a NULL
    # value would silently clip to the lower cut), while SQL twins'
    # GREATEST typically propagate NULL — pin the propagating behavior
    clipped = F.when(
        v.isNull(), F.lit(None).cast("double")
    ).otherwise(F.least(F.greatest(v, F.col("__lo")), F.col("__hi")))
    return (
        df.join(cuts, by)
        .withColumn(out, clipped)
        .drop("__lo", "__hi")
    )


def _sorted_group_median(
    frame: DataFrame, col: str, by: list, out: str
) -> DataFrame:
    """Exact interpolated per-group median via a per-GROUP window sort
    (spill-safe) instead of ``percentile``'s in-memory value buffer.
    Takes the two middle order statistics and interpolates exactly the
    way Spark's ``percentile``/DuckDB's ``quantile_cont`` do
    (``a + (b - a) * 0.5``), so the result is bit-identical to the
    buffer path.  NULL values are excluded first (percentile
    semantics); an all-NULL group yields no row, matching the
    aggregate's NULL row only in that downstream joins drop the group
    either way."""
    from pyspark.sql import Window

    v = F.col(col).cast("double")
    ranked = (
        frame.where(v.isNotNull())
        .select(*by, v.alias("__sv"))
        .withColumn(
            "__srn",
            F.row_number().over(
                Window.partitionBy(*by).orderBy("__sv")
            ),
        )
    )
    counts = ranked.groupBy(*by).agg(F.max("__srn").alias("__scnt"))
    mid = ranked.join(counts, by).where(
        (F.col("__srn") == F.floor((F.col("__scnt") + 1) / 2))
        | (F.col("__srn") == F.floor((F.col("__scnt") + 2) / 2))
    )
    return mid.groupBy(*by).agg(
        (
            F.min("__sv") + (F.max("__sv") - F.min("__sv")) * F.lit(0.5)
        ).alias(out)
    )


def grouped_moments(
    df,
    value_col: str,
    by_cols=(),
    sample: bool = False,
    round_digits: int | None = 4,
):
    """Per-group distribution-shape moments: (by_cols..., n, mean,
    variance, skewness, kurtosis_excess) from RAW POWER SUMS — the
    SUMMARIZE-class completion (profile_table gives location/spread;
    this adds asymmetry and tail weight, the screen for "is this
    metric even near-normal before I t-test it").

    Engine-neutral by construction: Spark's ``F.skewness`` and
    DuckDB's ``skewness`` disagree (population-biased vs
    bias-corrected sample forms), so NEITHER is used — both sides of
    the oracle compute identical expressions over Σv, Σv², Σv³, Σv⁴:

        m_k       = Σ(v − mean)^k / n   (expanded in power sums)
        skewness  = m₃ / m₂^1.5
        kurtosis  = m₄ / m₂² − 3       (excess)

    ``sample=True`` applies the standard bias corrections (g→G form
    for skewness, the n-dependent correction for kurtosis) — still
    from the same power sums.  NULL where undefined: n < 2 (n < 3/4
    for the corrected forms) or zero variance.

    Scale shape: ONE aggregate over one scan, FIVE aggregation
    doubles per stratum (n, Σv..Σv⁴) — nothing stratum-sized
    anywhere.  For integral values (cents) every power sum is an
    exact integer while n·max⁴ < 2⁵³, so the engines differ only in
    the final divisions (stat-class ROUND); for larger corpora the
    v⁴ sum is the first to lose exactness — documented, same class
    as every second-moment statistic."""
    keys = list(by_cols)
    v = F.col(value_col).cast("double")
    agg = (
        df.where(v.isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("__s1"),
            F.sum(v * v).alias("__s2"),
            F.sum(v * v * v).alias("__s3"),
            F.sum(v * v * v * v).alias("__s4"),
        )
    )
    n = F.col("n").cast("double")
    s1, s2, s3, s4 = (F.col(f"__s{i}") for i in (1, 2, 3, 4))
    mean = s1 / n
    # central moments from power sums
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3.0 * mean * s2 / n + 2.0 * mean * mean * mean
    m4 = (
        s4 / n
        - 4.0 * mean * s3 / n
        + 6.0 * mean * mean * s2 / n
        - 3.0 * mean * mean * mean * mean
    )
    if sample:
        var = F.when(F.col("n") >= 2, m2 * n / (n - 1.0))
        skew = F.when(
            (F.col("n") >= 3) & (m2 > 0.0),
            (F.sqrt(n * (n - 1.0)) / (n - 2.0))
            * (m3 / F.pow(m2, F.lit(1.5))),
        )
        kurt = F.when(
            (F.col("n") >= 4) & (m2 > 0.0),
            ((n - 1.0) / ((n - 2.0) * (n - 3.0)))
            * ((n + 1.0) * (m4 / (m2 * m2) - 3.0) + 6.0),
        )
    else:
        var = F.when(F.col("n") >= 1, m2)
        skew = F.when(
            (F.col("n") >= 2) & (m2 > 0.0), m3 / F.pow(m2, F.lit(1.5))
        )
        kurt = F.when(
            (F.col("n") >= 2) & (m2 > 0.0), m4 / (m2 * m2) - 3.0
        )
    mean_out = mean
    if round_digits is not None:
        mean_out = F.round(mean_out, round_digits)
        var = F.round(var, round_digits)
        skew = F.round(skew, round_digits)
        kurt = F.round(kurt, round_digits)
    return agg.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        mean_out.alias("mean"),
        var.alias("variance"),
        skew.alias("skewness"),
        kurt.alias("kurtosis_excess"),
    )


def quantile_buckets(
    df,
    value_col: str,
    n_buckets: int = 10,
    by_cols=(),
    exact: bool = True,
    out_col: str = "bucket",
):
    """Equal-frequency bucket ASSIGNMENT: attach each row's quantile
    bucket (0..n_buckets−1) within its ``by_cols`` stratum — the
    decile/percentile binning that feeds PSI references, calibration
    tables and rank features.  Bucket b is the half-open interval
    (edge_b, edge_{b+1}] over the n_buckets−1 interior quantile
    edges; assignment is ``Σ (v > edge)`` — ties at an edge go DOWN
    (strict >), deterministic cross-engine because the exact
    ``percentile`` edges match DuckDB's ``quantile_cont``
    bit-for-bit on the same multiset (the established profiler
    discipline) and the comparisons are exact.

    ``exact=False`` swaps ``approx_percentile`` in (bounded-memory
    KLL-class sketch) — the corpus path, same caveat as every approx
    knob: edges are engine-specific, so no bit-level oracle.

    The operator is ROW-PRESERVING: every input row survives.  NULL
    values get a NULL bucket, and so do rows whose stratum has no
    edges at all (an all-NULL stratum, or a NULL in any ``by_cols``
    key — the edge join is a LEFT join, so a keyless row simply
    finds no edge array rather than vanishing).

    Scale shape: edges = ONE grouped aggregate (|strata| × (B−1)
    doubles) joined back broadcast; assignment is a projection — the
    corpus never shuffles.  Exact mode buffers each stratum's values
    in one aggregation state (the exact-percentile bound,
    grouped_robust_stats' documented trade); approx mode is the
    100 TB default."""
    keys = list(by_cols)
    v = F.col(value_col).cast("double")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    if exact:
        edges_expr = F.percentile(v, F.array(*[F.lit(q) for q in qs]))
    else:
        edges_expr = F.approx_percentile(
            v, F.array(*[F.lit(q) for q in qs]), F.lit(10000)
        )
    edges = (
        df.where(v.isNotNull())
        .groupBy(*keys)
        .agg(edges_expr.alias("__edges"))
    )
    # LEFT join (ADVICE r8): an inner join silently dropped rows in
    # all-NULL strata and rows with a NULL by-key; a left join keeps
    # them with a NULL __edges array, which the bucket expression
    # below turns into the documented NULL bucket.  The no-keys case
    # joins on a constant-true condition (a crossJoin against an
    # EMPTY edges frame would likewise erase the corpus).
    j = (
        df.join(F.broadcast(edges), keys, "left")
        if keys
        else df.join(F.broadcast(edges), F.lit(True), "left")
    )
    bucket = F.when(
        v.isNotNull() & F.col("__edges").isNotNull(),
        F.aggregate(
            F.col("__edges"),
            F.lit(0),
            lambda acc, e: acc + (v > e).cast("int"),
        ),
    )
    return j.select(*df.columns, bucket.cast("int").alias(out_col))
