"""Unit tests for tfidf_keywords (retrieval.py) and containment_join
(dedup.py) against pure-Python references."""

import math

from duckdb_imputation_spark.operators.dedup import containment_join
from duckdb_imputation_spark.operators.retrieval import tfidf_keywords

DOCS = [
    (1, "apple banana apple cherry"),
    (2, "banana cherry cherry date date date"),
    (3, "apple elderberry"),
    (4, ""),  # empty: must produce no keywords, not crash
]


def _py_tfidf(docs, k):
    n = len(docs)
    tf = {}
    for did, text in docs:
        for t in text.split():
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    out = {}
    for did, _ in docs:
        scored = [
            (round(c * (math.log((n + 1) / (df[t] + 1)) + 1), 6), t, c)
            for (d, t), c in tf.items()
            if d == did
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[did] = scored[:k]
    return out


def test_tfidf_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = tfidf_keywords(df, "text", "doc_id", k=2).collect()
    ref = _py_tfidf(DOCS, 2)
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r)
    assert 4 not in got  # empty doc: no tokens, no rows
    for did, exp in ref.items():
        if not exp:
            continue
        g = sorted(got[did], key=lambda r: r["rnk"])
        assert [r["token"] for r in g] == [t for _, t, _ in exp]
        assert [r["tf"] for r in g] == [c for _, _, c in exp]
        for r, (s, _, _) in zip(g, exp):
            assert abs(r["score"] - s) < 1e-9


def test_tfidf_min_df_drops_hapax(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = tfidf_keywords(df, "text", "doc_id", k=5, min_df=2).collect()
    toks = {r["token"] for r in rows}
    # elderberry and date appear in exactly one document each
    assert "elderberry" not in toks and "date" not in toks
    assert "apple" in toks and "cherry" in toks


def _grams(text, n):
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


CORPUS = [
    (10, "the quick brown fox jumps over the lazy dog tonight"),
    (11, "a totally different sentence with no shared phrasing at all"),
    (12, "prefix words then the quick brown fox jumps over the lazy dog tonight and a suffix"),
]
QUERIES = [
    (100, "the quick brown fox jumps over the lazy dog tonight"),  # in 10, 12
    (101, "no such phrase anywhere in this corpus exists here"),
]


def test_containment_matches_python_reference(spark):
    q = spark.createDataFrame(QUERIES, "q_id int, q_text string")
    c = spark.createDataFrame(CORPUS, "c_id int, c_text string")
    got = {
        (r["q_id"], r["c_id"]): r
        for r in containment_join(
            q, c, "q_id", "q_text", "c_id", "c_text", n=4, threshold=0.5
        ).collect()
    }
    for qid, qt in QUERIES:
        qg = _grams(qt, 4)
        for cid, ct in CORPUS:
            m = len(qg & _grams(ct, 4))
            keep = 1000 * m >= 500 * len(qg)
            if keep:
                r = got[(qid, cid)]
                assert r["n_shared"] == m
                assert r["n_query_grams"] == len(qg)
                assert abs(r["containment"] - round(m / len(qg), 6)) < 1e-12
            else:
                assert (qid, cid) not in got
    # the full-phrase query is contained in both 10 and 12
    assert (100, 10) in got and got[(100, 10)]["containment"] == 1.0
    assert (100, 12) in got and got[(100, 12)]["containment"] == 1.0
    assert not any(qid == 101 for qid, _ in got)


def test_containment_short_query_whole_doc_gram(spark):
    # query shorter than n tokens falls back to one whole-text gram
    q = spark.createDataFrame([(1, "lazy dog")], "q_id int, q_text string")
    c = spark.createDataFrame(
        [(2, "lazy dog"), (3, "the lazy dog barks")],
        "c_id int, c_text string",
    )
    got = {
        (r["q_id"], r["c_id"]): r["containment"]
        for r in containment_join(
            q, c, "q_id", "q_text", "c_id", "c_text", n=8, threshold=0.9
        ).collect()
    }
    # doc 2's single whole-doc gram == the query's; doc 3's differs
    assert got == {(1, 2): 1.0}


def test_containment_max_gram_df_guard(spark):
    # a gram present in EVERY corpus doc is dropped by the hot guard,
    # one-sidedly lowering containment
    q = spark.createDataFrame(
        [(1, "common phrase here now")], "q_id int, q_text string"
    )
    c = spark.createDataFrame(
        [(i, "common phrase here now") for i in range(2, 6)],
        "c_id int, c_text string",
    )
    full = containment_join(
        q, c, "q_id", "q_text", "c_id", "c_text", n=4, threshold=0.5
    ).count()
    capped = containment_join(
        q, c, "q_id", "q_text", "c_id", "c_text", n=4, threshold=0.5,
        max_gram_df=3,
    ).count()
    assert full == 4 and capped == 0


# ------------------------------------------------------- RRF fusion

def test_rrf_matches_python_reference(spark):
    from duckdb_imputation_spark.operators.retrieval import rrf_fuse

    l1 = [(1, 1), (2, 2), (3, 3), (4, 4)]          # (doc, rank)
    l2 = [(3, 1), (1, 2), (5, 3)]
    d1 = spark.createDataFrame(l1, "doc_id int, rnk int")
    d2 = spark.createDataFrame(l2, "doc_id int, rnk int")
    got = rrf_fuse([d1, d2], "doc_id", "rnk", k=60).collect()
    ref = {}
    for doc, r in l1 + l2:
        ref[doc] = ref.get(doc, 0.0) + 1.0 / (60 + r)
    assert len(got) == 5
    # scores match and output is ordered (score desc, id asc)
    for row in got:
        assert abs(row["rrf_score"] - round(ref[row["doc_id"]], 6)) < 1e-12
    order = [(r["rrf_score"], r["doc_id"]) for r in got]
    assert order == sorted(order, key=lambda t: (-t[0], t[1]))
    # doc 1 (ranks 1+2) and doc 3 (ranks 3+1) tie exactly -> id breaks
    top2 = [r["doc_id"] for r in got[:2]]
    assert top2 == [1, 3]
    n_lists = {r["doc_id"]: r["n_lists"] for r in got}
    assert n_lists == {1: 2, 3: 2, 2: 1, 4: 1, 5: 1}


def test_rrf_topk_and_single_list(spark):
    from duckdb_imputation_spark.operators.retrieval import rrf_fuse

    d = spark.createDataFrame(
        [(i, i) for i in range(1, 20)], "doc_id int, rnk int"
    )
    got = rrf_fuse([d], "doc_id", "rnk", topk=5).collect()
    assert [r["doc_id"] for r in got] == [1, 2, 3, 4, 5]
