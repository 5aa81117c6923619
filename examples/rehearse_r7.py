#!/usr/bin/env python
"""Scale rehearsal for the round-6 operators (VERDICT r6 #5): run each
at sf0.1 and at the 10x replica (.data/sf1, built by
examples/make_sf1.py) and print the wall-clock ratio, plus the
specific scale variables the verdict called out:

* connected_components_pages — round count at 10x edges (a denser
  transition graph can merge components and change the diameter) and
  per-round wall;
* bloom_decontaminate_documents — phase-2 exact-join survivor count
  (the "maybe" set) vs corpus size, the FP-rate-driven shuffle volume;
* equidepth_histogram_lineitem — the shard-offset rank at 10x rows;
* interpolated_bigram_scores — model build at ~10x model corpus.

A data-bound op should come in well under 10x (fixed overheads
amortize, 32 cores absorb rows); at or past ~10x means per-row cost
grew with volume — a scale smell to investigate.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from duckdb_imputation_spark.queries import QUERIES  # noqa: E402
from duckdb_imputation_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.data/sf1")

OPS = [
    "connected_components_pages",
    "bloom_decontaminate_documents",
    "equidepth_histogram_lineitem",
    "interpolated_bigram_scores",
]


def time_query(spark, name: str, sf: str, repeats: int = 2) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def components_rounds(spark, sf: str) -> tuple[int, int, float]:
    """(rounds, n_components, wall) for the navigation graph at sf."""
    from duckdb_imputation_spark.operators.graph import (
        connected_components,
        navigation_edges,
    )

    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    edges = navigation_edges(ev, "user_id", "k", ["ts", "event_id"]).where(
        F.col("weight") >= 5
    )
    stats: dict = {}
    t0 = time.monotonic()
    out = connected_components(edges, stats=stats)
    ncomp = out.select("component").distinct().count()
    wall = time.monotonic() - t0
    return stats.get("rounds", -1), ncomp, wall


def bloom_phase2_volume(spark, sf: str) -> tuple[int, int]:
    """(maybe-gram count, total corpus gram count): the phase-2 exact
    semi-join input volume vs what the unfiltered exact path would
    shuffle."""
    from duckdb_imputation_spark.operators.dedup import _gram_hashes
    from duckdb_imputation_spark.operators.sketches import (
        bloom_build,
        bloom_contains_inline,
    )

    d = spark.read.parquet(f"{sf}/documents.parquet")
    ev = d.filter("doc_id % 89 = 0")
    taint = _gram_hashes(ev, "text", 13).select(
        F.col("__h").cast("string").alias("__h")
    )
    corp = _gram_hashes(d, "text", 13, id_col="doc_id").select(
        "doc_id", F.col("__h").cast("string").alias("__h")
    )
    bf = bloom_build(taint, "__h", m_bits=1 << 14, k_hashes=4)
    probed = bloom_contains_inline(
        corp, bf, "__h", m_bits=1 << 14, k_hashes=4
    )
    total = corp.count()
    maybe = probed.where(F.col("maybe_present")).count()
    return maybe, total


def main() -> None:
    spark = get_spark("rehearse-r7")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF01}/region.parquet").count()  # warm JVM
    print(f"{'op':38s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}", flush=True)
    for name in OPS:
        t_small = time_query(spark, name, SF01)
        t_big = time_query(spark, name, SF1)
        print(
            f"{name:38s} {t_small:8.2f} {t_big:8.2f} "
            f"{t_big / t_small:5.1f}x",
            flush=True,
        )
    for sf, tag in ((SF01, "sf0.1"), (SF1, "sf1")):
        r, nc, wall = components_rounds(spark, sf)
        print(
            f"components[{tag}]: rounds={r} components={nc} "
            f"wall={wall:.2f}s per-round={wall / max(r, 1):.2f}s",
            flush=True,
        )
    for sf, tag in ((SF01, "sf0.1"), (SF1, "sf1")):
        maybe, total = bloom_phase2_volume(spark, sf)
        print(
            f"bloom_phase2[{tag}]: maybe={maybe} of {total} grams "
            f"({100.0 * maybe / total:.2f}% reach the exact join)",
            flush=True,
        )


if __name__ == "__main__":
    main()
