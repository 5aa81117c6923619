#!/usr/bin/env python
"""End-to-end LLM training-data pipeline demo over the testdata corpus:

  scrub PII → quality filter → exact + MinHash dedup → line dedup →
  duplicate-passage REMOVAL → decontaminate against an eval set →
  CCNet perplexity split (drop the tail) + DSIR importance weights →
  temperature-weighted domain mix → BPE tokenizer train + encode →
  chunk → pack into context-window bins → BM25 retrieval

Each stage is the production operator from the package; run with
``python examples/pipeline_demo.py [sf_dir]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from duckdb_imputation_spark.operators import dedup as dd
from duckdb_imputation_spark.operators import textprep as tp
from duckdb_imputation_spark.operators import textstats as ts
from duckdb_imputation_spark.session import get_spark
from duckdb_imputation_spark.sources import load_table


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pipeline-demo")
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    n0 = docs.count()

    clean = docs.withColumn("text", tp.scrub_pii(F.col("text")))
    clean = tp.quality_filter(clean, "text", min_tokens=5)
    # Gopher-rule pass on top of the ratio-score filter: drop documents
    # failing any of the rule-family checks (word count, mean word
    # length, symbol ratio, alphabetic fraction, stopword presence)
    clean = clean.where(ts.gopher_rules(F.col("text"))["keep"])
    # the cleaned frame feeds every downstream stage and several
    # counts — materialize once instead of re-running scrub + quality
    # + rule evaluation per action (a real pipeline persists here)
    clean = clean.localCheckpoint(eager=False)
    n1 = clean.count()

    # model-based filtering (CCNet/FineWeb pattern): distill the rule
    # labels into an in-engine classifier, evaluate it in-engine (AUC +
    # thresholded report), keep the smooth probability as the corpus
    # mixing/filter signal — scoring is a pure JVM projection
    from duckdb_imputation_spark.ml.eval import classification_report
    from duckdb_imputation_spark.ml.logreg import logreg_predict_expr
    from duckdb_imputation_spark.ml.quality import (
        QUALITY_FEATURE_NAMES,
        quality_features,
        train_quality_classifier,
    )
    from duckdb_imputation_spark.operators.stats import auc_score

    w = train_quality_classifier(docs, "text")
    qf = quality_features(F.col("text"))
    scored = docs.select(
        "doc_id",
        *[qf[n].alias(n) for n in QUALITY_FEATURE_NAMES],
        qf["y"].alias("label"),
    ).select(
        "doc_id",
        "label",
        logreg_predict_expr(QUALITY_FEATURE_NAMES, w).alias("p"),
    )
    rep = classification_report(scored, "label", "p").first()
    auc = auc_score(scored, "label", "p").first()
    print(
        f"quality classifier vs rule labels: AUC {auc['auc']}, "
        f"F1 {rep['f1']}, brier {rep['brier']} "
        f"({rep['tp']}tp/{rep['fp']}fp/{rep['tn']}tn/{rep['fn']}fn)"
    )

    deduped = dd.minhash_dedup(dd.exact_dedup(clean, "text", "doc_id"), "text", "doc_id")
    n2 = deduped.count()

    deduped = dd.line_dedup(deduped, "text", "doc_id")  # C4-style lines
    # cut shared passages instead of dropping whole documents
    deduped = dd.remove_duplicate_passages(
        deduped, "text", "doc_id", n=5
    ).select("doc_id", F.col("clean_text").alias("text"))
    deduped = tp.quality_filter(deduped, "text", min_tokens=5)

    eval_set = docs.filter("doc_id % 97 = 0")  # stand-in benchmark set
    decontaminated = dd.minhash_decontaminate(
        deduped, eval_set, "text", "doc_id"
    ).localCheckpoint(eager=False)  # feeds LM build, DSIR, selection
    n3 = decontaminated.count()

    # data selection: CCNet-style perplexity terciles on the corpus's
    # own unigram LM — train on head+middle, drop the tail — plus DSIR
    # importance weights toward the docs the eval stand-in looks like
    from duckdb_imputation_spark.operators.hashing import ws_tokens as _wt
    from duckdb_imputation_spark.operators.selection import (
        importance_weights,
        perplexity_buckets,
    )

    tk = decontaminated.select("doc_id", F.explode(_wt(F.col("text"))).alias("t"))
    lm = tk.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = lm.agg(F.sum("c").alias("n"))
    scores = (
        tk.join(F.broadcast(lm), "t").crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg((F.sum(F.log(F.col("c") / F.col("n"))) / F.count(F.lit(1))).alias("lp"))
    )
    buckets = perplexity_buckets(scores, "lp")
    kept_ids = buckets.where(F.col("ppl_bucket") != "tail").select("doc_id")
    selected = decontaminated.join(kept_ids, "doc_id")
    dsir = importance_weights(
        decontaminated, F.col("doc_id") % 97 == 0
    ).agg(F.round(F.avg("imp_weight"), 4).alias("w")).first()
    print(
        f"selection: kept head+middle = {selected.count()} docs; "
        f"mean DSIR weight toward eval-like docs {dsir['w']}"
    )

    sampled = tp.temperature_sample(
        selected.withColumn("src", F.col("doc_id") % 7),
        "src", "doc_id", target_frac=0.8,
    ).localCheckpoint(eager=False)  # feeds BPE, chunking, heavy hitters
    # subword tokenizer: train on the cleaned corpus, encode every doc
    from duckdb_imputation_spark.operators import bpe

    merges = bpe.bpe_train(sampled, "text", num_merges=60)
    encoded = bpe.bpe_encode(sampled, "text", merges)
    tok_stats = encoded.agg(
        F.sum(F.size("bpe_tokens")).alias("total_tok"),
        F.round(F.avg(F.size("bpe_tokens")), 1).alias("avg_tok"),
    ).first()
    print(
        f"bpe: {len(merges)} merges; {tok_stats['total_tok']} tokens "
        f"({tok_stats['avg_tok']}/doc)"
    )

    chunked = tp.chunk_documents(sampled, "text", "doc_id", chunk_tokens=128, overlap=32)
    # packing needs a UNIQUE order key — (doc, chunk) composite
    chunked = chunked.withColumn(
        "chunk_uid", F.col("doc_id") * 1000 + F.col("chunk_idx")
    )
    packed = tp.pack_sequences(
        chunked.withColumnRenamed("chunk_tokens", "n_tok"), "n_tok", "chunk_uid", 512
    )
    bins = packed.agg(
        F.countDistinct("bin").alias("bins"), F.count(F.lit(1)).alias("chunks")
    ).first()

    # corpus vocabulary report without a vocabulary-sized GROUP BY:
    # exact heavy-hitter tokens via the Misra-Gries two-pass plan
    from duckdb_imputation_spark.operators.hashing import ws_tokens
    from duckdb_imputation_spark.operators.sketches import heavy_hitters

    hh = heavy_hitters(
        sampled.select(F.explode(ws_tokens(F.col("text"))).alias("t")),
        "t",
        k=50,
    )
    print(f"heavy-hitter tokens (>N/51, exact): {hh.count()}")

    print(f"docs {n0} -> quality {n1} -> dedup {n2} -> decontaminated {n3}")

    # dataset-versioning view of what the pipeline did: diff the cleaned
    # corpus against the raw snapshot (removed = filtered/deduped docs,
    # changed = passage-cut or line-deduped text)
    from duckdb_imputation_spark.operators.snapshot import snapshot_diff

    delta = (
        snapshot_diff(docs.select("doc_id", "text"), decontaminated,
                      ["doc_id"], ["text"])
        .groupBy("change_type").count().collect()
    )
    print("snapshot diff vs raw: " +
          ", ".join(f"{r['change_type']}={r['count']}" for r in sorted(
              delta, key=lambda r: r["change_type"])))

    # corpus cardinality card from mergeable HLL sketches (the state a
    # 100 TB pipeline would persist per batch and union incrementally)
    from duckdb_imputation_spark.operators import sketches as sk
    from duckdb_imputation_spark.operators.hashing import ws_tokens

    toks = decontaminated.select(F.explode(ws_tokens(F.col("text"))).alias("t"))
    vocab_est = sk.estimate_distinct(sk.distinct_sketch(toks, "t")).first()
    print(f"~{vocab_est['n_distinct']} distinct tokens across "
          f"{vocab_est['n_rows']} (HLL estimate)")
    # ...and a count-min frequency card for the same card (bounded at
    # depth*width cells; per-batch CM tables merge by exact addition)
    cm = sk.countmin_sketch(toks, "t", depth=4, width=512)
    top_true = toks.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    probe = top_true.orderBy(F.desc("c"), "t").limit(3)
    ests = sk.countmin_estimate(cm, probe, "t", depth=4, width=512).collect()
    print("cm top tokens: " + ", ".join(
        f"{r['t']}~{r['cm_est']} (true {r['c']})"
        for r in sorted(ests, key=lambda r: -r["c"])))
    print(f"packed {bins['chunks']} chunks into {bins['bins']} bins of <=512 tokens")

    # shippability audit on the packed output — the pre-ingest gate a
    # production pipeline runs before handing data to training: exact
    # integer violation counts per declared constraint, one scan for
    # all row checks
    from duckdb_imputation_spark.operators.validate import (
        in_range,
        not_null,
        unique,
        validate_constraints,
    )

    audit = validate_constraints(
        packed,
        [
            not_null("bin", name="bin_assigned"),
            unique(["chunk_uid"], name="chunk_uid_unique"),
            in_range("n_tok", 1, 512, name="chunk_fits_window"),
        ],
    ).collect()
    print("audit: " + ", ".join(
        "{}={}".format(
            r["check"],
            "PASS" if r["passed"] else f"{r['n_violations']} violations",
        )
        for r in audit))

    # retrieval over the cleaned corpus: build the BM25 index once,
    # run several queries without re-scanning the documents
    from duckdb_imputation_spark.operators.retrieval import bm25_index

    idx = bm25_index(decontaminated, "text", "doc_id")
    for q in (["hash", "join"], ["data", "scan"]):
        top = idx.search(q, k=3).collect()
        print(f"bm25 {q}: " + ", ".join(f"doc {r['doc_id']} ({r['score']})" for r in top))
    idx.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
