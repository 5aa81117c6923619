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


# --------------------------------------------------------------------- #
# randomized cross-implementation references (seeded)                   #
# --------------------------------------------------------------------- #

import hashlib
import random


def _py_bucket(tok: str, row: int, width: int) -> int:
    h = hashlib.md5(f"cm{row}|{tok}".encode()).hexdigest()
    return int(h[:8], 16) % width


def _py_cm(tokens, depth, width):
    cells = {}
    for t in tokens:
        for r in range(depth):
            k = (r, _py_bucket(t, r, width))
            cells[k] = cells.get(k, 0) + 1
    return cells


def test_countmin_matches_python_reference(spark):
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(40)]
    tokens = [rng.choice(vocab) for _ in range(800)]
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_sketch(df, "token", depth=3, width=32).collect()
    }
    assert got == _py_cm(tokens, 3, 32)
    # estimates == min over the reference's rows for every distinct token
    est = {
        r["token"]: r["cm_est"]
        for r in countmin_estimate(
            countmin_sketch(df, "token", depth=3, width=32),
            df.distinct(),
            "token",
            depth=3,
            width=32,
        ).collect()
    }
    ref = _py_cm(tokens, 3, 32)
    for t in set(tokens):
        want = min(ref[(r, _py_bucket(t, r, 32))] for r in range(3))
        assert est[t] == want


def test_countmin_merge_associative_random_split(spark):
    rng = random.Random(11)
    tokens = [f"t{rng.randrange(25)}" for _ in range(600)]
    parts = [[], [], []]
    for t in tokens:
        parts[rng.randrange(3)].append(t)
    dfs = [
        spark.createDataFrame([(t,) for t in p] or [("__e__",)], "token string")
        for p in parts
    ]
    sks = [countmin_sketch(d, "token", depth=3, width=16) for d in dfs]
    left = merge_countmin(merge_countmin(sks[0], sks[1]), sks[2])
    right = merge_countmin(sks[0], merge_countmin(sks[1], sks[2]))
    a = {(r["row"], r["bucket"]): r["cnt"] for r in left.collect()}
    b = {(r["row"], r["bucket"]): r["cnt"] for r in right.collect()}
    assert a == b


def test_perplexity_buckets_matches_python_reference(spark):
    rng = random.Random(3)
    rows = [(i, round(rng.uniform(-5, 0), 2)) for i in range(101)]  # ties likely
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = {
        r["doc_id"]: (r["ppl_rank"], r["ppl_bucket"])
        for r in perplexity_buckets(df, "score", n_shards=4).collect()
    }
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    n = len(rows)
    for rank0, (doc, _) in enumerate(ordered):
        rank = rank0 + 1
        want = (
            "head" if rank * 3 <= n else "middle" if rank * 3 <= 2 * n else "tail"
        )
        assert got[doc] == (rank, want), doc


def test_importance_weights_matches_python_reference(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(15)]
    rows = []
    for i in range(30):
        lang = "en" if rng.random() < 0.4 else "xx"
        text = " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 12)))
        rows.append((i, lang, text))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    src_cnt, tgt_cnt = {}, {}
    for _, lang, text in rows:
        for t in text.split():
            src_cnt[t] = src_cnt.get(t, 0) + 1
            if lang == "en":
                tgt_cnt[t] = tgt_cnt.get(t, 0) + 1
    n_src = sum(src_cnt.values())
    n_tgt = sum(tgt_cnt.values())
    v = len(src_cnt)

    def py_weight(text):
        toks = text.split()
        s = sum(
            math.log(
                ((tgt_cnt.get(t, 0) + 1) * (n_src + v))
                / ((src_cnt[t] + 1) * (n_tgt + v))
            )
            for t in toks
        )
        return s / len(toks)

    out = importance_weights(df, F.col("lang") == "en", round_digits=None)
    got = {r["doc_id"]: r["imp_weight"] for r in out.collect()}
    for i, _, text in rows:
        assert abs(got[i] - py_weight(text)) < 1e-9, i


# --------------------------------------------------------------------- #
# domain divergence                                                     #
# --------------------------------------------------------------------- #


def test_domain_divergence_matches_python_reference(spark):
    from duckdb_imputation_spark.operators.selection import domain_divergence

    rows = [
        (1, "a", "x x y z"),
        (2, "a", "x y y"),
        (3, "b", "z z z w"),
        (4, "b", "w z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: (r["kl_divergence"], r["n_tokens"])
        for r in domain_divergence(df, "source", round_digits=None).collect()
    }

    corp, dom = {}, {}
    for _, s, text in rows:
        for t in text.split():
            corp[t] = corp.get(t, 0) + 1
            dom.setdefault(s, {}).setdefault(t, 0)
            dom[s][t] += 1
    n = sum(corp.values())
    for s, cnts in dom.items():
        nd = sum(cnts.values())
        kl = sum(
            (c / nd) * math.log((c / nd) / (corp[t] / n))
            for t, c in cnts.items()
        )
        got_kl, got_n = out[s]
        assert got_n == nd
        assert abs(got_kl - kl) < 1e-12, s
        assert got_kl >= 0


def test_domain_divergence_zero_for_identical_distribution(spark):
    from duckdb_imputation_spark.operators.selection import domain_divergence

    rows = [(1, "a", "x y"), (2, "b", "x y"), (3, "a", "x y"), (4, "b", "x y")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r["kl_divergence"] for r in domain_divergence(df, "source").collect()}
    assert out == {"a": 0.0, "b": 0.0}


# --------------------------------------------------------------------- #
# bottom-k sample                                                       #
# --------------------------------------------------------------------- #


def test_bottomk_merge_equals_single_pass(spark):
    from duckdb_imputation_spark.operators.sketches import (
        bottomk_sample,
        merge_bottomk,
    )

    rows = [(i, f"doc{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = bottomk_sample(df.where("doc_id < 120"), "doc_id", k=15)
    b = bottomk_sample(df.where("doc_id >= 120"), "doc_id", k=15)
    merged = {r["doc_id"] for r in merge_bottomk(a, b, k=15, key_col="doc_id").collect()}
    single = {r["doc_id"] for r in bottomk_sample(df, "doc_id", k=15).collect()}
    assert merged == single


def test_bottomk_deterministic_and_salt_varies(spark):
    from duckdb_imputation_spark.operators.sketches import bottomk_sample

    rows = [(i,) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long")
    s1 = {r["doc_id"] for r in bottomk_sample(df, "doc_id", k=20).collect()}
    s2 = {r["doc_id"] for r in bottomk_sample(df, "doc_id", k=20).collect()}
    s3 = {r["doc_id"] for r in bottomk_sample(df, "doc_id", k=20, salt="x").collect()}
    assert s1 == s2          # rerun-stable
    assert s1 != s3          # independent draw under a different salt
    assert len(s1) == 20


def test_bottomk_overlapping_inputs_dedupe(spark):
    from duckdb_imputation_spark.operators.sketches import (
        bottomk_sample,
        merge_bottomk,
    )

    rows = [(i,) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long")
    a = bottomk_sample(df, "doc_id", k=10)
    m = merge_bottomk(a, a, k=10, key_col="doc_id").collect()
    assert len(m) == 10
    assert len({r["doc_id"] for r in m}) == 10


# --------------------------------------------------------------------- #
# weighted sample (A-ES)                                                #
# --------------------------------------------------------------------- #


def test_weighted_sample_matches_python_formula(spark):
    import hashlib as _hl

    from duckdb_imputation_spark.operators.selection import weighted_sample

    rows = [(i, float(1 + i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df, "w", k=10).collect()}

    def u(i):
        h = _hl.md5(f"ws|{i}".encode()).hexdigest()
        return (int(h[:15], 16) + 1.0) / float(2**60)

    keys = sorted(
        ((u(i) ** (1.0 / w), i) for i, w in rows), key=lambda t: (-t[0], t[1])
    )
    want = {i for _, i in keys[:10]}
    assert got == want


def test_weighted_sample_bias_toward_heavy_weights(spark):
    """Across many independent salts, heavy rows must be sampled far
    more often than light rows (the property DSIR resampling needs)."""
    from duckdb_imputation_spark.operators.selection import weighted_sample

    rows = [(i, 10.0 if i < 10 else 0.1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy = 0
    draws = 12
    for s in range(draws):
        got = weighted_sample(df, "w", k=10, salt=str(s)).collect()
        heavy += sum(1 for r in got if r["doc_id"] < 10)
    # heavy rows are 10 of 100 ids but carry ~92% of the weight; with
    # k=10 per draw they must dominate the samples
    assert heavy > draws * 10 * 0.6, heavy


def test_weighted_sample_excludes_nonpositive(spark):
    from duckdb_imputation_spark.operators.selection import weighted_sample

    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_sample(df, "w", k=10).collect()}
    assert got == {1, 5}


# --------------------------------------------------------------------- #
# hashed-feature (bounded-model) selection modes                        #
# --------------------------------------------------------------------- #


def _py_sel_bucket(tok: str, n: int) -> str:
    import hashlib as _hl

    h = int(_hl.md5(("selbkt|" + tok).encode()).hexdigest()[:8], 16)
    return str(h % n)


def test_importance_weights_bucketed_matches_python_reference(spark):
    """hash_buckets=N must equal the exact estimator computed over the
    bucket-coarsened token stream — the DSIR paper's hashed n-gram
    construction, which bounds the model at N rows at ANY corpus
    scale."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(25):
        lang = "en" if rng.random() < 0.5 else "xx"
        text = " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 10)))
        rows.append((i, lang, text))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    n_buckets = 13  # << vocab size: collisions are the point

    src_cnt, tgt_cnt = {}, {}
    for _, lang, text in rows:
        for t in text.split():
            b = _py_sel_bucket(t, n_buckets)
            src_cnt[b] = src_cnt.get(b, 0) + 1
            if lang == "en":
                tgt_cnt[b] = tgt_cnt.get(b, 0) + 1
    n_src, n_tgt, v = sum(src_cnt.values()), sum(tgt_cnt.values()), len(src_cnt)

    def py_weight(text):
        toks = [_py_sel_bucket(t, n_buckets) for t in text.split()]
        s = sum(
            math.log(
                ((tgt_cnt.get(t, 0) + 1) * (n_src + v))
                / ((src_cnt[t] + 1) * (n_tgt + v))
            )
            for t in toks
        )
        return s / len(toks)

    out = importance_weights(
        df, F.col("lang") == "en", round_digits=None, hash_buckets=n_buckets
    )
    got = {r["doc_id"]: r["imp_weight"] for r in out.collect()}
    for i, _, text in rows:
        assert abs(got[i] - py_weight(text)) < 1e-9, i


def test_domain_divergence_bucketed_matches_python_reference(spark):
    from duckdb_imputation_spark.operators.selection import domain_divergence

    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(30)]
    rows = [
        (i, rng.choice(["a", "b", "c"]),
         " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 9))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    n_buckets = 7
    out = {
        r["source"]: (r["kl_divergence"], r["n_tokens"])
        for r in domain_divergence(
            df, "source", round_digits=None, hash_buckets=n_buckets
        ).collect()
    }

    corp, dom = {}, {}
    for _, s, text in rows:
        for t in text.split():
            b = _py_sel_bucket(t, n_buckets)
            corp[b] = corp.get(b, 0) + 1
            dom.setdefault(s, {}).setdefault(b, 0)
            dom[s][b] += 1
    n = sum(corp.values())
    for s, cnts in dom.items():
        nd = sum(cnts.values())
        kl = sum(
            (c / nd) * math.log((c / nd) / (corp[b] / n))
            for b, c in cnts.items()
        )
        got_kl, got_n = out[s]
        assert got_n == nd
        assert abs(got_kl - kl) < 1e-12, s
        assert got_kl >= 0


def test_bucketed_mode_leaves_exact_mode_unchanged(spark):
    """Adding hash_buckets must not perturb the default path — the
    catalog rows' driver hashes ride on it."""
    rows = [(1, "en", "x y z"), (2, "xx", "x q"), (3, "en", "z z")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = importance_weights(df, F.col("lang") == "en").collect()
    b = importance_weights(df, F.col("lang") == "en", hash_buckets=None).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --------------------------------------------------------------------- #
# merge_bottomk determinism + salt guard                                #
# --------------------------------------------------------------------- #


def test_bottomk_merge_rejects_mixed_salts(spark):
    from duckdb_imputation_spark.operators.sketches import (
        bottomk_sample,
        merge_bottomk,
    )

    rows = [(i,) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long")
    a = bottomk_sample(df, "doc_id", k=50)
    b = bottomk_sample(df, "doc_id", k=50, salt="other")
    with pytest.raises(ValueError, match="different salts"):
        merge_bottomk(a, b, k=10, key_col="doc_id").collect()


def test_bottomk_merge_duplicate_key_attrs_deterministic(spark):
    """The same key appearing in several samples with DIFFERENT non-key
    attributes must collapse to one deterministic row (min under the
    non-key column ordering), independent of input order."""
    from duckdb_imputation_spark.operators.sketches import (
        bottomk_sample,
        merge_bottomk,
    )

    base = [(i,) for i in range(60)]
    df = spark.createDataFrame(base, "doc_id long")
    a = bottomk_sample(df, "doc_id", k=60).withColumn("src", F.lit("alpha"))
    b = bottomk_sample(df, "doc_id", k=60).withColumn("src", F.lit("beta"))
    m1 = merge_bottomk(a, b, k=20, key_col="doc_id").collect()
    m2 = merge_bottomk(b, a, k=20, key_col="doc_id").collect()
    as_map1 = {r["doc_id"]: r["src"] for r in m1}
    as_map2 = {r["doc_id"]: r["src"] for r in m2}
    assert as_map1 == as_map2
    # the winner is the md5-of-JSON ordering minimum — the SAME label
    # everywhere and independent of input order, not "whichever
    # arrived first"
    assert len(set(as_map1.values())) == 1


def test_bottomk_null_keys_excluded(spark):
    """A NULL key hashes to NULL, which sorts FIRST ascending — it must
    never claim a sample slot."""
    from duckdb_imputation_spark.operators.sketches import bottomk_sample

    rows = [(i,) for i in range(30)] + [(None,)] * 5
    df = spark.createDataFrame(rows, "doc_id long")
    got = bottomk_sample(df, "doc_id", k=10).collect()
    assert len(got) == 10
    assert all(r["doc_id"] is not None for r in got)
    assert all(r["__bk_hash"] is not None for r in got)


def test_bottomk_merge_type_agnostic_tiebreak(spark):
    """Samples carrying unorderable attribute columns (maps) must still
    merge — the tiebreak is the md5 of the JSON form, not a direct
    column ordering."""
    from duckdb_imputation_spark.operators.sketches import (
        bottomk_sample,
        merge_bottomk,
    )

    df = spark.createDataFrame(
        [(i, {"k": str(i)}) for i in range(40)],
        "doc_id long, props map<string,string>",
    )
    a = bottomk_sample(df, "doc_id", k=15)
    m = merge_bottomk(a, a, k=15, key_col="doc_id").collect()
    assert len(m) == 15
    assert all(r["props"] is not None for r in m)


# --------------------------------------------------------------------- #
# interpolated bigram LM                                                #
# --------------------------------------------------------------------- #


def test_interpolated_bigram_unseen_scores_finite(spark):
    """Documents entirely outside the model vocabulary must score low
    but FINITE (add-one unigram backoff), never -inf/NULL."""
    from duckdb_imputation_spark.operators.textstats import (
        interpolated_bigram_logprob,
    )

    model = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    scored = spark.createDataFrame(
        [(1, "a b a b"), (2, "zz qq zz qq")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in interpolated_bigram_logprob(
            scored, "text", "doc_id", model_df=model, lam=0.7
        ).collect()
    }
    assert out[1] is not None and out[2] is not None
    assert out[2] < out[1]  # out-of-model text scores strictly lower
    assert out[2] > -50     # finite, not an -inf sentinel


def test_interpolated_bigram_matches_python_reference(spark):
    import math

    from duckdb_imputation_spark.operators.textstats import (
        interpolated_bigram_logprob,
    )

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(12)]
    mrows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 9))))
        for i in range(15)
    ]
    srows = [
        (i, " ".join(rng.choice(vocab + ["oov"]) for _ in range(rng.randrange(2, 9))))
        for i in range(15)
    ]
    model = spark.createDataFrame(mrows, "doc_id long, text string")
    scored = spark.createDataFrame(srows, "doc_id long, text string")

    big, ctx, uni = {}, {}, {}
    for _, text in mrows:
        toks = text.split()
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    n_uni, v = sum(uni.values()), len(uni)
    lam = 0.7

    def py_score(text):
        toks = text.split()
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            return None
        s = 0.0
        for a, b in pairs:
            p_big = big.get((a, b), 0) / ctx[a] if ctx.get(a) else 0.0
            p_uni = (uni.get(b, 0) + 1) / (n_uni + v)
            s += math.log(lam * p_big + (1 - lam) * p_uni)
        return s / len(pairs)

    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in interpolated_bigram_logprob(
            scored, "text", "doc_id", model_df=model, lam=lam,
            round_digits=None,
        ).collect()
    }
    for i, text in srows:
        exp = py_score(text)
        if exp is None:
            assert i not in out
        else:
            assert abs(out[i] - exp) < 1e-9, i


# ------------------------------------------------------------------ PSI

def test_psi_matches_python_reference(spark):
    import math
    import random

    from duckdb_imputation_spark.operators.selection import psi_drift

    rng = random.Random(11)
    edges = [10.0, 20.0, 40.0]
    rows = []
    for h in range(2):
        for _ in range(70):
            rows.append((h, "a", float(rng.randrange(0, 50))))
        for _ in range(55):
            rows.append((h, "b", float(rng.randrange(5, 60))))
    df = spark.createDataFrame(rows, "h int, g string, v double")
    out = {
        r["h"]: r
        for r in psi_drift(
            df, "g", "v", "a", "b", edges, by_cols=["h"], round_digits=None
        ).collect()
    }
    bb = len(edges) + 1
    for h in range(2):
        xs = [v for hh, g, v in rows if hh == h and g == "a"]
        ys = [v for hh, g, v in rows if hh == h and g == "b"]

        def hist(vals):
            c = [0] * bb
            for x in vals:
                c[sum(x >= e for e in edges)] += 1
            return c

        ca, cb = hist(xs), hist(ys)
        ref = sum(
            ((a + 1) / (len(xs) + bb) - (b + 1) / (len(ys) + bb))
            * math.log(
                ((a + 1) / (len(xs) + bb)) / ((b + 1) / (len(ys) + bb))
            )
            for a, b in zip(ca, cb)
        )
        r = out[h]
        assert (r["n_a"], r["n_b"]) == (len(xs), len(ys))
        assert abs(r["psi"] - ref) < 1e-12, (h, r["psi"], ref)


def test_psi_identical_cohorts_zero_and_unobserved_closure(spark):
    from duckdb_imputation_spark.operators.selection import psi_drift

    # identical cohorts -> PSI exactly 0 even with unobserved buckets
    rows = [("a", 5.0), ("b", 5.0), ("a", 15.0), ("b", 15.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = psi_drift(df, "g", "v", "a", "b", [10.0, 20.0, 30.0, 40.0]).collect()[0]
    assert r["psi"] == 0.0
    # empty cohort -> NULL
    df2 = spark.createDataFrame([("a", 5.0)], "g string, v double")
    r2 = psi_drift(df2, "g", "v", "a", "b", [10.0]).collect()[0]
    assert r2["psi"] is None and r2["n_b"] == 0


# ------------------------------------------- grouped weighted sample

def test_weighted_sample_grouped_equals_global_per_group(spark):
    from duckdb_imputation_spark.operators.selection import (
        weighted_sample,
        weighted_sample_grouped,
    )

    rows = [
        (i, f"g{i % 3}", float(1 + (i * 7) % 23)) for i in range(90)
    ] + [(900, "g0", None), (901, "g1", -2.0)]  # excluded weights
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    got = weighted_sample_grouped(
        df, "w", 4, by_cols=["g"], id_col="doc_id"
    ).collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r["g"], set()).add(r["doc_id"])
    assert all(len(v) == 4 for v in by_group.values())
    assert 900 not in by_group.get("g0", set())
    assert 901 not in by_group.get("g1", set())
    # stratification is free: each group's draw == the global draw
    # restricted to that group (same key formula)
    for g, ids in by_group.items():
        sub = df.where(F.col("g") == g)
        glob = {
            r["doc_id"]
            for r in weighted_sample(sub, "w", 4, id_col="doc_id").collect()
        }
        assert ids == glob, g


# ------------------------------------------------- source overlap

def test_source_overlap_matches_python_reference(spark):
    from duckdb_imputation_spark.operators.selection import source_overlap

    docs = [
        ("s1", "alpha beta gamma"),
        ("s1", "beta delta"),
        ("s2", "beta gamma epsilon"),
        ("s3", "zeta eta"),  # disjoint from s1/s2
        (None, "alpha"),  # NULL domain dropped
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        (r["domain_a"], r["domain_b"]): r
        for r in source_overlap(df, "source").collect()
    }
    v1 = {"alpha", "beta", "gamma", "delta"}
    v2 = {"beta", "gamma", "epsilon"}
    r = got[("s1", "s2")]
    inter = len(v1 & v2)
    assert r["n_shared"] == inter
    assert (r["n_a"], r["n_b"]) == (len(v1), len(v2))
    assert abs(r["jaccard"] - inter / len(v1 | v2)) < 1e-12
    # disjoint vocabularies never co-occur on a token: no pair row
    assert ("s1", "s3") not in got and ("s2", "s3") not in got
    assert len(got) == 1
