"""Unit tests for operators/selection.py (DSIR importance weights,
CCNet perplexity buckets) and the count-min sketch family in
operators/sketches.py.

Properties under test are the ones the operators' 100 TB story rests
on: CM merge is EXACT cell-wise addition (unlike HLL there is no
estimator asymmetry), CM estimates only ever over-count, the rank
terciles are equal-sized and deterministic under reordering, and the
importance weight orders target-like documents above source-typical
ones.
"""

import math

import pytest
from pyspark.sql import functions as F

from duckdb_imputation_spark.operators.selection import (
    importance_weights,
    perplexity_buckets,
)
from duckdb_imputation_spark.operators.sketches import (
    countmin_estimate,
    countmin_sketch,
    merge_countmin,
)


# --------------------------------------------------------------------- #
# count-min                                                             #
# --------------------------------------------------------------------- #


@pytest.fixture()
def tokens_df(spark):
    rows = [("a",)] * 10 + [("b",)] * 5 + [("c",)] * 3 + [("d",)] * 1
    return spark.createDataFrame(rows, "token string")


def _est_map(sketch, queries, spark, **kw):
    out = countmin_estimate(sketch, queries, "token", **kw)
    return {r["token"]: r["cm_est"] for r in out.collect()}


def test_countmin_never_underestimates(spark, tokens_df):
    sk = countmin_sketch(tokens_df, "token", depth=4, width=64)
    q = tokens_df.distinct()
    est = _est_map(sk, q, spark, depth=4, width=64)
    truth = {"a": 10, "b": 5, "c": 3, "d": 1}
    for tok, t in truth.items():
        assert est[tok] >= t, f"{tok}: CM under-counted {est[tok]} < {t}"


def test_countmin_wide_sketch_is_exact(spark, tokens_df):
    # 4 distinct values in a 4x1024 sketch: collision probability ~0 —
    # and with these md5 buckets, known to be collision-free
    sk = countmin_sketch(tokens_df, "token", depth=4, width=1024)
    est = _est_map(sk, tokens_df.distinct(), spark, depth=4, width=1024)
    assert est == {"a": 10, "b": 5, "c": 3, "d": 1}


def test_countmin_merge_equals_single_pass(spark, tokens_df):
    """merge(sketch(A), sketch(B)) must be cell-identical to
    sketch(A ∪ B) — the property that lets per-batch sketches
    accumulate without rescanning old data."""
    ha = tokens_df.where(F.col("token").isin("a", "b"))
    hb = tokens_df.where(F.col("token").isin("c", "d"))
    merged = merge_countmin(
        countmin_sketch(ha, "token", depth=4, width=64),
        countmin_sketch(hb, "token", depth=4, width=64),
    )
    single = countmin_sketch(tokens_df, "token", depth=4, width=64)
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    s = {(r["row"], r["bucket"]): r["cnt"] for r in single.collect()}
    assert m == s


def test_countmin_weighted_build_matches_expanded(spark, tokens_df):
    """Sketching a pre-aggregated (value, count) table with weight_col
    must equal sketching the expanded rows."""
    pre = tokens_df.groupBy("token").agg(F.count(F.lit(1)).alias("w"))
    ws = countmin_sketch(pre, "token", depth=4, width=64, weight_col="w")
    xs = countmin_sketch(tokens_df, "token", depth=4, width=64)
    a = {(r["row"], r["bucket"]): r["cnt"] for r in ws.collect()}
    b = {(r["row"], r["bucket"]): r["cnt"] for r in xs.collect()}
    assert a == b


def test_countmin_unseen_value_bounded_by_collisions(spark, tokens_df):
    sk = countmin_sketch(tokens_df, "token", depth=4, width=1024)
    q = spark.createDataFrame([("zzz_never_seen",)], "token string")
    est = _est_map(sk, q, spark, depth=4, width=1024)
    # wide sketch, 4 values: the unseen probe must miss every bucket
    assert est["zzz_never_seen"] == 0


def test_countmin_sketch_bounded_size(spark, tokens_df):
    sk = countmin_sketch(tokens_df, "token", depth=4, width=8)
    assert sk.count() <= 4 * 8


# --------------------------------------------------------------------- #
# perplexity buckets                                                    #
# --------------------------------------------------------------------- #


@pytest.fixture()
def scored_df(spark):
    rows = [(i, float(-i)) for i in range(1, 10)]  # doc 1 best ... doc 9 worst
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_perplexity_buckets_equal_thirds(spark, scored_df):
    out = perplexity_buckets(scored_df, "score", n_shards=3).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["ppl_bucket"], []).append(r["doc_id"])
    assert sorted(by_bucket["head"]) == [1, 2, 3]
    assert sorted(by_bucket["middle"]) == [4, 5, 6]
    assert sorted(by_bucket["tail"]) == [7, 8, 9]


def test_perplexity_buckets_rank_is_dense_and_ordered(spark, scored_df):
    out = perplexity_buckets(scored_df, "score", n_shards=2).collect()
    ranks = {r["doc_id"]: r["ppl_rank"] for r in out}
    # score -1 is the highest → rank 1; ranks are the permutation 1..9
    assert ranks[1] == 1 and ranks[9] == 9
    assert sorted(ranks.values()) == list(range(1, 10))


def test_perplexity_buckets_ties_break_by_id(spark):
    rows = [(i, 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = perplexity_buckets(df, "score", n_shards=2).collect()
    ranks = {r["doc_id"]: r["ppl_rank"] for r in out}
    assert ranks == {0: 1, 1: 2, 2: 3, 3: 4, 4: 5}


def test_perplexity_buckets_non_multiple_of_three(spark):
    rows = [(i, float(-i)) for i in range(1, 8)]  # n=7 -> 2/2/3
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = perplexity_buckets(df, "score", n_shards=2).collect()
    sizes = {}
    for r in out:
        sizes[r["ppl_bucket"]] = sizes.get(r["ppl_bucket"], 0) + 1
    # floor semantics: head gets floor(7/3)=2, middle floor(14/3)-2=2, tail 3
    assert sizes == {"head": 2, "middle": 2, "tail": 3}


# --------------------------------------------------------------------- #
# importance weights                                                    #
# --------------------------------------------------------------------- #


@pytest.fixture()
def domain_df(spark):
    rows = [
        (1, "en", "alpha beta alpha beta"),
        (2, "en", "alpha beta gamma"),
        (3, "xx", "delta epsilon delta"),
        (4, "xx", "delta zeta"),
        (5, "xx", "alpha beta"),  # source doc that LOOKS like the target
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_importance_weights_orders_target_like_docs_first(spark, domain_df):
    out = importance_weights(domain_df, F.col("lang") == "en")
    w = {r["doc_id"]: r["imp_weight"] for r in out.collect()}
    # docs made of target-typical tokens outrank docs of target-unseen ones
    assert w[1] > w[3] and w[1] > w[4]
    # the target-looking source doc scores like the target docs, above
    # the out-of-domain ones — the property resampling relies on
    assert w[5] > w[3]


def test_importance_weights_reference_value(spark, domain_df):
    """Hand-computed smoothed log-ratio for doc 4 ('delta zeta'):
    target counts are 0 for both tokens."""
    out = importance_weights(domain_df, F.col("lang") == "en", round_digits=None)
    w = {r["doc_id"]: r["imp_weight"] for r in out.collect()}
    n_src, n_tgt, v = 14.0, 7.0, 6.0  # 14 source tokens, 7 target, 6 vocab
    def lr(c_tgt, c_src):
        return math.log(((c_tgt + 1) * (n_src + v)) / ((c_src + 1) * (n_tgt + v)))
    expected = (lr(0, 3) + lr(0, 1)) / 2  # delta: c_src=3; zeta: c_src=1
    assert abs(w[4] - expected) < 1e-12


def test_importance_weights_token_counts(spark, domain_df):
    out = importance_weights(domain_df, F.col("lang") == "en")
    n = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert n == {1: 4, 2: 3, 3: 3, 4: 2, 5: 2}
