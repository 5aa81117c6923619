"""BPE tokenizer: merge learning, encode, and the rank-order/priority
equivalence the oracle SQL relies on.

The catalog rows cross-check the full pipeline against DuckDB; these
tests pin the algorithm itself against golden values (the classic
low/lower/newest/widest corpus, Sennrich et al. 2016 §3.2) and an
INDEPENDENT priority-queue reference encoder."""

import random

import pytest
from pyspark.sql import functions as F

from duckdb_imputation_spark.operators.bpe import (
    bpe_apply_word,
    bpe_encode,
    bpe_train,
    learn_merges,
    word_frequencies,
)

CLASSIC = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_learn_merges_classic_golden():
    merges = learn_merges(CLASSIC, 10, min_pair_freq=2)
    # frequencies: es 9, est 9, lo 7, low 7, ew/ne/newest-chain 6, ...
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("l", "o")
    assert merges[3] == ("lo", "w")
    assert ("w", "idest") in merges or ("wi", "dest") in merges or (
        "w",
        "i",
    ) in merges  # widest fully assembles by merge 10
    enc = bpe_apply_word("lowest", merges)
    assert "".join(enc) == "lowest"
    assert enc[0] == "low"  # 'low' learned as a unit


def test_min_pair_freq_stops_learning():
    merges = learn_merges({"ab": 1, "cd": 1}, 10, min_pair_freq=2)
    assert merges == []


def _priority_encode(word, merges):
    """Independent reference: true priority BPE — repeatedly merge the
    LOWEST-RANK pair present (leftmost on rank ties), one merge at a
    time."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    toks = list(word)
    while True:
        best_rank, best_i = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            return toks
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]


@pytest.mark.parametrize(
    "word", ["lowest", "newest", "widest", "low", "wider", "x", ""]
)
def test_apply_word_matches_priority_reference(word):
    merges = learn_merges(CLASSIC, 10, min_pair_freq=2)
    assert bpe_apply_word(word, merges) == _priority_encode(word, merges)


def test_apply_word_matches_priority_reference_randomized():
    rng = random.Random(7)
    for trial in range(30):
        words = {
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 12))): rng.randint(1, 9)
            for _ in range(rng.randint(2, 20))
        }
        merges = learn_merges(words, rng.randint(1, 15), min_pair_freq=1)
        for w in list(words) + ["abcabcabc", "aaaaaaa", "cbacba"]:
            got = bpe_apply_word(w, merges)
            assert got == _priority_encode(w, merges), (trial, w, merges)
            assert "".join(got) == w  # lossless


def test_word_frequencies_and_train_on_spark(spark):
    df = spark.createDataFrame(
        [(0, "low low low low low lower lower"),
         (1, "newest newest newest newest newest newest"),
         (2, "widest widest widest")],
        "doc_id long, text string",
    )
    freq = {r["word"]: r["count"] for r in word_frequencies(df, "text").collect()}
    assert freq == CLASSIC
    assert bpe_train(df, "text", 4) == learn_merges(CLASSIC, 4)


def test_encode_distributed_matches_local(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["low lower", "newest widest low", ""])],
        "doc_id long, text string",
    )
    merges = learn_merges(CLASSIC, 8)
    out = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode(df, "text", merges).collect()
    }
    def local(text):
        toks = []
        for w in text.split():
            toks.extend(bpe_apply_word(w, merges))
        return toks
    assert out[0] == local("low lower")
    assert out[1] == local("newest widest low")
    assert out[2] == []


def test_encode_is_arrow_batched(spark):
    df = spark.createDataFrame([(0, "low lower")], "doc_id long, text string")
    enc = bpe_encode(df, "text", learn_merges(CLASSIC, 4))
    enc.collect()
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_save_load_roundtrip(spark, tmp_path):
    from duckdb_imputation_spark.operators.bpe import bpe_load, bpe_save

    merges = learn_merges(CLASSIC, 8)
    path = str(tmp_path / "bpe_merges")
    bpe_save(spark, merges, path)
    assert bpe_load(spark, path) == merges
    # encode with the reloaded artifact is identical
    df = spark.createDataFrame([(0, "low lower newest")], "doc_id long, text string")
    a = bpe_encode(df, "text", merges).collect()[0]["bpe_tokens"]
    b = bpe_encode(df, "text", bpe_load(spark, path)).collect()[0]["bpe_tokens"]
    assert list(a) == list(b)


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.text(alphabet="abcd", min_size=1, max_size=10)


@settings(max_examples=60, deadline=None)
@given(
    counts=st.dictionaries(_words, st.integers(1, 9), min_size=1, max_size=15),
    num_merges=st.integers(0, 12),
    probe=_words,
)
def test_bpe_properties(counts, num_merges, probe):
    """Pure-algorithm properties under random corpora: encode is
    lossless, equals the independent priority encoder, and every learned
    merge pair had frequency >= min_pair_freq when learned."""
    merges = learn_merges(counts, num_merges, min_pair_freq=1)
    assert len(merges) <= num_merges
    assert len(set(merges)) == len(merges)  # no merge learned twice
    for w in list(counts) + [probe]:
        toks = bpe_apply_word(w, merges)
        assert "".join(toks) == w
        assert toks == _priority_encode(w, merges)


def test_null_text_encodes_empty(spark):
    df = spark.createDataFrame([(0, None), (1, "low")], "doc_id long, text string")
    out = {r["doc_id"]: list(r["bpe_tokens"])
           for r in bpe_encode(df, "text", learn_merges(CLASSIC, 4)).collect()}
    assert out[0] == []
    assert out[1] == ["low"]


def test_null_text_word_frequencies(spark):
    df = spark.createDataFrame([(0, None), (1, "low low")], "doc_id long, text string")
    freq = {r["word"]: r["count"] for r in word_frequencies(df, "text").collect()}
    assert freq == {"low": 2}


def test_jvm_encode_agrees_with_pandas_encode(spark):
    from duckdb_imputation_spark.operators.bpe import bpe_encode_jvm

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low lower lowest", "newest widest low", "", "ababab abab",
             "aaaa aa a", None]
        )],
        "doc_id long, text string",
    )
    merges = learn_merges(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3,
         "ababab": 4, "aaaa": 4}, 12, min_pair_freq=1,
    )
    a = {r.doc_id: list(r.bpe_tokens) for r in bpe_encode(df, "text", merges).collect()}
    b = {r.doc_id: list(r.bpe_tokens) for r in bpe_encode_jvm(df, "text", merges).collect()}
    assert a == b
    plan = bpe_encode_jvm(df, "text", merges)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # truly zero Python stages
