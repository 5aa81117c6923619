"""BM25: the one-shot scorer vs the prebuilt reusable index.

bm25_index is the 100 TB RAG path (corpus scanned once, searches touch
only postings); its results must be IDENTICAL to bm25_topk's, and its
search plan must stay off the corpus scan."""

import pytest

from duckdb_imputation_spark.operators.retrieval import bm25_index, bm25_topk
from duckdb_imputation_spark.plans import executed_plan, lint_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def index(docs):
    idx = bm25_index(docs, "text", "doc_id")
    yield idx
    idx.unpersist()


@pytest.mark.parametrize(
    "terms,k",
    [
        (["hash", "join", "filter"], 15),
        (["the", "data"], 5),
        (["zzz_not_in_corpus"], 3),
    ],
)
def test_index_search_matches_oneshot(docs, index, terms, k):
    want = [tuple(r) for r in bm25_topk(docs, "text", "doc_id", terms, k=k).collect()]
    got = [tuple(r) for r in index.search(terms, k=k).collect()]
    assert got == want


def test_index_stats_match_corpus(docs, index):
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.hashing import ws_tokens

    doclen = (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("t"), "doc_id")
        .groupBy("doc_id")
        .count()
    )
    n, avg = doclen.select(
        F.count(F.lit(1)).cast("double"), F.avg("count")
    ).first()
    assert index.n_docs == float(n)
    assert index.avgdl == pytest.approx(float(avg), rel=0, abs=1e-12)


def test_search_plan_avoids_corpus_scan(index):
    """A search must read the (persisted) postings, not re-tokenize the
    corpus: no Generate/explode and no documents FileScan in the plan,
    and zero lint errors."""
    df = index.search(["hash", "join"], k=5)
    plan = executed_plan(df)
    # the postings read is a cache scan with the query-term predicate
    # pushed into it (the explode/FileScan lines below InMemoryRelation
    # are the cached frame's BUILD recipe, not the executed path)
    scans = [
        l for l in plan.splitlines() if l.strip().startswith(("InMemoryTableScan", "+- InMemoryTableScan")) or "InMemoryTableScan" in l
    ]
    postings_scans = [l for l in scans if "term" in l]
    assert postings_scans, plan
    assert any("IN (hash,join)" in l for l in postings_scans), postings_scans
    assert [f for f in lint_plan(df) if f.severity == "error"] == []


def test_saved_index_roundtrip_and_pruning(spark, docs, index, tmp_path_factory):
    """save() → load() → search(): identical results to the in-memory
    index, and the postings scan prunes to the query terms' buckets
    (PartitionFilters on __bucket in the FileScan)."""
    import shutil

    from duckdb_imputation_spark.operators.retrieval import bm25_index_load

    path = "/root/repo/.data/tmp_bm25_index"
    try:
        index.save(path, n_buckets=8)
        loaded = bm25_index_load(spark, path)
        assert loaded.n_buckets == 8
        terms = ["hash", "join", "filter"]
        want = [tuple(r) for r in index.search(terms, k=15).collect()]
        got_df = loaded.search(terms, k=15)
        assert [tuple(r) for r in got_df.collect()] == want
        plan = executed_plan(got_df)
        scan = next(
            l for l in plan.splitlines()
            if "FileScan" in l and "postings" in l
        )
        assert "PartitionFilters: [" in scan
        # the bucket predicate must actually reach the partition filters
        assert "__bucket" in scan.split("PartitionFilters:")[1].split("]")[0]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_ivf_index_save_load_pruning(spark):
    """IVFIndex parquet round trip: identical search results and
    physical partition pruning on the probed clusters."""
    import shutil

    from duckdb_imputation_spark.operators.simsearch import (
        IVFIndex,
        ivf_index_load,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = IVFIndex(emb, "embedding", "vec_id", nlist=8)
    path = "/root/repo/.data/tmp_ivf_index"
    try:
        idx.save(path)
        loaded = ivf_index_load(spark, path)
        q = [float(x) for x in emb.first()["embedding"]]
        want = [tuple(r) for r in idx.search(q, k=5, nprobe=3).collect()]
        got_df = loaded.search(q, k=5, nprobe=3)
        assert [tuple(r) for r in got_df.collect()] == want
        plan = executed_plan(got_df)
        scan = next(
            l for l in plan.splitlines() if "FileScan" in l and "vectors" in l
        )
        pf = scan.split("PartitionFilters:")[1].split("]")[0]
        assert "__cluster" in pf, scan
    finally:
        idx.unpersist()
        shutil.rmtree(path, ignore_errors=True)


def test_minhash_index_round_trip(spark, tmp_path):
    """Incremental dedup against a persisted signature index: exact and
    near copies of indexed docs are dropped, fresh docs survive, the
    reopened index gives identical results, and its banded scan is
    partition-pruned by the batch's bucket predicate."""
    from duckdb_imputation_spark.operators.minhash_index import (
        minhash_index, minhash_index_load,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id < 200").select("doc_id", "text")
    idx = minhash_index(corpus, "text", "doc_id", k=16, bands=4, shingle=5)

    from pyspark.sql import functions as F
    batch = (
        docs.filter("doc_id < 3")  # exact copies of indexed docs
        .select((F.col("doc_id") + 5000).alias("doc_id"), "text")
        .unionAll(
            docs.filter("doc_id BETWEEN 300 AND 304")  # NOT in the index
            .select("doc_id", "text")
        )
    )
    kept = sorted(
        r["doc_id"]
        for r in idx.dedup_new(batch, "text", "doc_id", threshold=0.5).collect()
    )
    assert kept == [300, 301, 302, 303, 304]

    path = str(tmp_path / "mh_idx")
    idx.save(path)
    re = minhash_index_load(spark, path)
    kept2 = sorted(
        r["doc_id"]
        for r in re.dedup_new(batch, "text", "doc_id", threshold=0.5).collect()
    )
    assert kept2 == kept

    tainted = re.tainted_ids(batch, "text", "doc_id", threshold=0.5)
    tainted.collect()
    plan = tainted._jdf.queryExecution().executedPlan().toString()
    # the reopened banded scan (the only one projecting __band) must be
    # partition-pruned to the batch's bucket hashes
    scans = [l for l in plan.split("\n") if "FileScan" in l and "__band" in l]
    assert scans
    assert all("__pbucket" in l.split("PartitionFilters:")[1].split("]")[0]
               for l in scans)


def test_index_incremental_update_matches_rebuild(spark, docs, tmp_path):
    """bm25_index_update: merging a new batch into a saved index gives
    IDENTICAL search results to rebuilding over the full corpus, the
    corpus-level scalars stay exact, bucket pruning survives the
    append, and an empty batch is a no-op."""
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.retrieval import (
        bm25_index_load,
        bm25_index_update,
    )

    a = docs.filter("doc_id < 300")
    b = docs.filter("doc_id >= 300")
    path = str(tmp_path / "bm25")
    idx_a = bm25_index(a, "text", "doc_id", persist=False)
    idx_a.save(path, n_buckets=16)

    updated = bm25_index_update(spark, path, b, "text", "doc_id")
    full = bm25_index(docs, "text", "doc_id", persist=False)
    assert updated.n_docs == full.n_docs
    assert updated.avgdl == pytest.approx(full.avgdl, rel=1e-12)

    for terms in (["hash", "join"], ["the", "data", "scan"]):
        got = [tuple(r) for r in updated.search(terms, k=12).collect()]
        want = [tuple(r) for r in full.search(terms, k=12).collect()]
        assert got == want, terms
    # per-term dfs merged exactly (spot-check against the full rebuild)
    gstats = {
        r["term"]: r["__df"]
        for r in updated.term_stats.filter(
            F.col("term").isin(["the", "data", "hash"])
        ).collect()
    }
    wstats = {
        r["term"]: r["__df"]
        for r in full.term_stats.filter(
            F.col("term").isin(["the", "data", "hash"])
        ).collect()
    }
    assert gstats == wstats
    # bucket pruning still physical after the append
    plan = executed_plan(
        updated.search(["data"], k=3).limit(3)
    )
    for line in plan.splitlines():
        if "FileScan" in line and "postings" in line:
            assert "PartitionFilters: [" in line
            assert "__bucket" in line.split("PartitionFilters:")[1].split("]")[0]
    # empty batch: no-op
    before = updated.search(["data"], k=5).collect()
    noop = bm25_index_update(
        spark, path, b.filter("doc_id < 0"), "text", "doc_id"
    )
    assert noop.n_docs == updated.n_docs
    assert noop.search(["data"], k=5).collect() == before


def test_ivf_index_incremental_add(spark, tmp_path):
    """ivf_index_add: appending a new batch against the frozen
    centroids yields searches identical to assigning the full corpus
    against those same centroids; pruning survives; empty batch no-op."""
    from duckdb_imputation_spark.operators.simsearch import (
        IVFIndex,
        assign_clusters,
        ivf_index_add,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.filter("vec_id % 2 = 0")
    b = emb.filter("vec_id % 2 = 1")
    path = str(tmp_path / "ivf")
    idx = IVFIndex(a, nlist=8, seed=3)
    idx.save(path)
    idx.unpersist()

    updated = ivf_index_add(spark, path, b)
    # reference: same frozen centroids, full corpus assigned fresh
    ref = IVFIndex(
        None,
        _prebuilt=(
            "embedding",
            "vec_id",
            updated.centroids,
            assign_clusters(emb, "embedding", updated.centroids),
        ),
    )
    for vid in (1, 7, 42):
        q = list(emb.filter(f"vec_id = {vid}").first()["embedding"])
        got = [tuple(r) for r in updated.search(q, k=8, nprobe=3).collect()]
        want = [tuple(r) for r in ref.search(q, k=8, nprobe=3).collect()]
        assert got == want
        assert got[0][0] == vid  # new vectors are themselves findable
    # probe filter still prunes partitions after the append
    probe_df = updated.search([0.1] * len(q), k=3, nprobe=2)
    probe_df.collect()  # finalize the AQE plan before inspecting it
    plan = executed_plan(probe_df)
    # NB: Location strings truncate in plan output, so match the filter
    # itself — the vectors read is the plan's only FileScan
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scans and all("PartitionFilters: [__cluster" in ln for ln in scans)
    # empty batch: no-op
    n_before = updated.assigned.count()
    noop = ivf_index_add(spark, path, b.filter("vec_id < 0"))
    assert noop.assigned.count() == n_before
