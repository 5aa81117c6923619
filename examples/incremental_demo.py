#!/usr/bin/env python
"""Incremental corpus-maintenance demo: the day-2 story.

A 100 TB corpus is not rebuilt when new documents arrive — every
index and statistic is maintained from the BATCH alone:

  day 0: build once — MinHash signature index, BM25 index, IVF ANN
         index, HLL distinct-sketch state
  day 1: a new batch arrives →
         dedup it against the signature index (batch-side pass only)
         → snapshot-diff report of what actually changes
         → bm25_index_update   (postings appended, dfs upserted)
         → ivf_index_add       (frozen-centroid assignment, append)
         → sketch merge        (register-max union, no rescan)
  nothing old is rescanned at any step.

Run with ``python examples/incremental_demo.py [sf_dir]``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from duckdb_imputation_spark.operators import sketches as sk
from duckdb_imputation_spark.operators.hashing import ws_tokens
from duckdb_imputation_spark.operators.minhash_index import (
    minhash_index,
    minhash_index_load,
)
from duckdb_imputation_spark.operators.retrieval import (
    bm25_index,
    bm25_index_update,
)
from duckdb_imputation_spark.operators.simsearch import IVFIndex, ivf_index_add
from duckdb_imputation_spark.operators.snapshot import snapshot_diff
from duckdb_imputation_spark.session import get_spark
from duckdb_imputation_spark.sources import load_table


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental-demo")
    root = tempfile.mkdtemp(prefix="incr_demo_")
    try:
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        emb = load_table(spark, sf, "embeddings")
        day0 = docs.filter("doc_id % 3 != 0")
        # the incoming batch: genuinely new docs plus sneaky exact
        # copies of already-indexed ones (they must be caught)
        fresh = docs.filter("doc_id % 3 = 0")
        copies = day0.limit(3).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
        batch = fresh.unionByName(copies)

        # ---- day 0: build every index ONCE ------------------------------
        mh = minhash_index(day0, "text", "doc_id", k=16, bands=4, shingle=5)
        mh.save(f"{root}/mh")
        bm25_index(day0, "text", "doc_id", persist=False).save(
            f"{root}/bm25", n_buckets=16
        )
        ivf = IVFIndex(emb.filter("vec_id % 2 = 0"), nlist=8, seed=1)
        ivf.save(f"{root}/ivf")
        ivf.unpersist()
        state = sk.distinct_sketch(
            day0.select(F.explode(ws_tokens(F.col("text"))).alias("t")), "t"
        )
        state.write.parquet(f"{root}/sketch")
        print(f"day0: indexed {day0.count()} docs")

        # ---- day 1: maintain everything from the batch alone ------------
        survivors = minhash_index_load(spark, f"{root}/mh").dedup_new(
            batch, "text", "doc_id", threshold=0.5
        )
        n_in, n_keep = batch.count(), survivors.count()
        print(f"batch: {n_in} in, {n_keep} new after index dedup "
              f"({n_in - n_keep} known copies dropped)")

        delta = snapshot_diff(
            day0, day0.unionByName(survivors), ["doc_id"]
        ).groupBy("change_type").count().collect()
        print("snapshot diff: " + ", ".join(
            f"{r['change_type']}={r['count']}" for r in delta))

        idx = bm25_index_update(
            spark, f"{root}/bm25", survivors, "text", "doc_id"
        )
        top = idx.search(["data", "scan"], k=3).collect()
        print(f"bm25 after update: n_docs={int(idx.n_docs)}, "
              "top=" + ", ".join(f"doc {r['doc_id']}" for r in top))

        updated_ivf = ivf_index_add(
            spark, f"{root}/ivf", emb.filter("vec_id % 2 = 1")
        )
        q = list(emb.filter("vec_id = 1").first()["embedding"])
        hit = updated_ivf.search(q, k=1, nprobe=3).first()
        print(f"ivf after add: self-hit for new vec 1 -> {hit['vec_id']}")

        batch_sk = sk.distinct_sketch(
            survivors.select(F.explode(ws_tokens(F.col("text"))).alias("t")),
            "t",
        )
        merged = sk.merge_distinct_sketches(
            spark.read.parquet(f"{root}/sketch"), batch_sk
        )
        est = sk.estimate_distinct(merged).first()
        print(f"sketch after merge: ~{est['n_distinct']} distinct tokens "
              f"over {est['n_rows']} (old data untouched)")

        # count-min frequency state: same incremental story, EXACT
        # cell-wise merge (no estimator asymmetry at all)
        base_cm = sk.countmin_sketch(
            day0.select(F.explode(ws_tokens(F.col("text"))).alias("t")),
            "t", depth=4, width=512,
        )
        batch_cm = sk.countmin_sketch(
            survivors.select(F.explode(ws_tokens(F.col("text"))).alias("t")),
            "t", depth=4, width=512,
        )
        merged_cm = sk.merge_countmin(base_cm, batch_cm)
        probe = spark.createDataFrame([("the",), ("data",)], "t string")
        ests = sk.countmin_estimate(merged_cm, probe, "t", depth=4, width=512)
        print("count-min after merge: " + ", ".join(
            f"{r['t']}~{r['cm_est']}" for r in ests.collect()))

        # Bloom membership state: grow the filter with the batch's
        # fingerprints by bitwise OR (idempotent — a replayed batch is
        # a no-op), then pre-screen tomorrow's arrivals map-side
        fp = F.md5("text")
        base_bf = sk.bloom_build(
            day0.select(fp.alias("fp")), "fp", m_bits=1 << 14, k_hashes=3
        )
        batch_bf = sk.bloom_build(
            survivors.select(fp.alias("fp")), "fp",
            m_bits=1 << 14, k_hashes=3,
        )
        bf = sk.merge_bloom(base_bf, batch_bf)
        tomorrow = day0.limit(2).unionByName(
            spark.createDataFrame(
                [(9_999_999, "never seen before text entirely")],
                "doc_id long, text string",
            )
        )
        screened = sk.bloom_contains_inline(
            tomorrow.select("doc_id", fp.alias("fp")), bf, "fp",
            m_bits=1 << 14, k_hashes=3,
        )
        flags = {r["doc_id"]: r["maybe_present"] for r in screened.collect()}
        n_known = sum(1 for v in flags.values() if v)
        print(f"bloom after merge: {n_known}/{len(flags)} of tomorrow's "
              "arrivals flagged maybe-known (map-side, zero shuffle)")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
