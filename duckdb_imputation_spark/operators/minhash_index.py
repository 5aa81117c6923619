"""Persisted MinHash-LSH signature index — incremental corpus dedup.

Iterative dataset building re-runs dedup every time a new crawl batch
arrives; re-signaturing a 100 TB corpus per batch is the dominant cost.
This index materializes the corpus's signatures and band buckets ONCE
(parquet, bucket-hash partitioned like the BM25 postings index,
retrieval.py), so deduplicating a new batch is: one signature pass over
the BATCH, a band-bucket join that partition-prunes the stored corpus
side to the batch's buckets, and a signature-slot Jaccard estimate —
the corpus text is never read again.

Verification semantics: the index stores signatures, not shingle sets,
so near-duplicate confirmation uses the unbiased MinHash estimator
(fraction of matching signature slots) — the same compromise as the
streaming dedup state (streaming/dedup_stream.py), for the same reason:
keeping shingle sets would make the index O(corpus text).  Exact
copies estimate 1.0; threshold semantics are on the estimator, which
at k=16 is coarse (granularity 1/16) — raise k at index build time for
tighter thresholds.

Reference anchor: the reference has no index surface (it is a batch
extension, SURVEY §2.3); this is pipeline infrastructure in the same
family as BM25Index / IVFIndex.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_band_buckets, minhash_signature_from_shingles
from .hashing import shingles

__all__ = ["MinHashIndex", "minhash_index", "minhash_index_load"]

logger = logging.getLogger(__name__)

# collect-and-prune ceiling: above this many distinct batch buckets the
# IN-list stops pruning usefully and the plain join wins
_MAX_PRUNE_BUCKETS = 10_000


class MinHashIndex:
    """In-memory handle: banded rows (__id, __band, __bucket,
    __pbucket), signatures (__id, __sig array<bigint>), and the LSH
    parameters they were built with."""

    def __init__(
        self,
        banded: DataFrame,
        sigs: DataFrame,
        k: int,
        bands: int,
        shingle: int,
        id_col: str,
        n_buckets: int = 64,
        persist: bool = False,
    ) -> None:
        # a freshly-BUILT index persists its corpus pipelines (else every
        # dedup_new would re-signature the corpus — the cost the index
        # exists to amortize); a LOADED index reads parquet, which is its
        # own materialization, so no cache layer on top
        if persist:
            banded = banded.persist()
            sigs = sigs.persist()
        self.banded = banded
        self.sigs = sigs
        self.k, self.bands, self.shingle = k, bands, shingle
        self.id_col = id_col
        self.n_buckets = n_buckets

    def unpersist(self) -> None:
        self.banded.unpersist()
        self.sigs.unpersist()

    def save(self, path: str) -> None:
        """Materialize as parquet under ``path``: banded rows partitioned
        by ``__pbucket = pmod(hash(__bucket), n_buckets)`` so a batch's
        bucket filter prunes partitions; signatures by id."""
        self.banded.write.partitionBy("__pbucket").mode("overwrite").parquet(
            f"{path}/banded"
        )
        self.sigs.write.mode("overwrite").parquet(f"{path}/sigs")
        self.banded.sparkSession.createDataFrame(
            [(self.k, self.bands, self.shingle, self.id_col, self.n_buckets)],
            "k int, bands int, shingle int, id_col string, n_buckets int",
        ).write.mode("overwrite").parquet(f"{path}/meta")

    def _batch_sideload(self, new_df: DataFrame, text_col: str, id_col: str):
        """Signature pass over the new batch only: banded rows +
        signatures, same parameters as the index."""
        banded = minhash_band_buckets(
            new_df, text_col, id_col, k=self.k, bands=self.bands,
            shingle=self.shingle,
        ).withColumn("__pbucket", F.pmod(F.hash("__bucket"), F.lit(self.n_buckets)))
        sig = minhash_signature_from_shingles(
            F.array_distinct(shingles(F.col(text_col), self.shingle)), self.k
        )
        sigs = new_df.select(F.col(id_col).alias("__id"), sig.alias("__sig"))
        return banded, sigs

    def tainted_ids(
        self, new_df: DataFrame, text_col: str, id_col: str,
        threshold: float = 0.5, prune: bool = True,
    ) -> DataFrame:
        """Batch ids whose estimated Jaccard against ANY indexed document
        reaches ``threshold`` — one column ``__id``."""
        nb, ns = self._batch_sideload(new_df, text_col, id_col)
        corpus = self.banded
        if prune:
            buckets = [
                r["__pbucket"]
                for r in nb.select("__pbucket").distinct().limit(
                    _MAX_PRUNE_BUCKETS + 1
                ).collect()
            ]
            if len(buckets) <= _MAX_PRUNE_BUCKETS:
                # partition-pruning predicate on the stored corpus scan
                corpus = corpus.filter(F.col("__pbucket").isin(buckets))
            else:
                logger.info(
                    "minhash_index: %d batch buckets > prune cap, "
                    "falling back to plain join", len(buckets),
                )
        cand = (
            nb.select(
                F.col("__id").alias("__new_id"), "__band", "__bucket"
            )
            .join(
                corpus.select(
                    F.col("__id").alias("__corpus_id"), "__band", "__bucket"
                ),
                ["__band", "__bucket"],
            )
            .select("__new_id", "__corpus_id")
            .distinct()
        )
        est = (
            cand.join(
                ns.select(F.col("__id").alias("__new_id"),
                          F.col("__sig").alias("__sig_n")),
                "__new_id",
            )
            .join(
                self.sigs.select(F.col("__id").alias("__corpus_id"),
                                 F.col("__sig").alias("__sig_c")),
                "__corpus_id",
            )
            .withColumn(
                "__est",
                F.size(
                    F.filter(
                        F.zip_with("__sig_n", "__sig_c", lambda a, b: a == b),
                        lambda m: m,
                    )
                )
                / F.lit(float(self.k)),
            )
        )
        return (
            est.filter(F.col("__est") >= threshold)
            .select(F.col("__new_id").alias("__id"))
            .distinct()
        )

    def dedup_new(
        self, new_df: DataFrame, text_col: str, id_col: str,
        threshold: float = 0.5, prune: bool = True,
    ) -> DataFrame:
        """Rows of ``new_df`` that near-duplicate nothing in the index
        (anti-join on the tainted-id set) — decontamination-against-
        corpus semantics for incremental ingestion."""
        tainted = self.tainted_ids(
            new_df, text_col, id_col, threshold=threshold, prune=prune
        ).withColumnRenamed("__id", id_col)
        return new_df.join(tainted, id_col, "left_anti")


def minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    shingle: int = 5,
    n_buckets: int = 64,
) -> MinHashIndex:
    """Build the index from the corpus: ONE signature pass producing
    banded rows and per-id signatures (both ids+hashes only)."""
    banded = minhash_band_buckets(
        df, text_col, id_col, k=k, bands=bands, shingle=shingle
    ).withColumn("__pbucket", F.pmod(F.hash("__bucket"), F.lit(n_buckets)))
    sig = minhash_signature_from_shingles(
        F.array_distinct(shingles(F.col(text_col), shingle)), k
    )
    sigs = df.select(F.col(id_col).alias("__id"), sig.alias("__sig"))
    return MinHashIndex(
        banded, sigs, k=k, bands=bands, shingle=shingle,
        id_col=id_col, n_buckets=n_buckets, persist=True,
    )


def minhash_index_load(spark, path: str) -> MinHashIndex:
    """Reopen an index written by :meth:`MinHashIndex.save`;
    ``dedup_new`` on it partition-prunes the banded scan via the
    ``__pbucket`` predicate."""
    meta = spark.read.parquet(f"{path}/meta").first()
    return MinHashIndex(
        spark.read.parquet(f"{path}/banded"),
        spark.read.parquet(f"{path}/sigs"),
        k=int(meta["k"]),
        bands=int(meta["bands"]),
        shingle=int(meta["shingle"]),
        id_col=meta["id_col"],
        n_buckets=int(meta["n_buckets"]),
    )
