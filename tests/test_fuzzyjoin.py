"""Fuzzy-join (deletion-variant blocking) correctness: randomized
equivalence against brute-force Levenshtein all-pairs — the blocking
must be LOSSLESS for the threshold (no false negatives), and the
verify step must kill every blocking false positive."""

import random

import pytest


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _random_strings(rng, n, alphabet="abc", lo=3, hi=8):
    # tiny alphabet on purpose: collisions and near-misses everywhere
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(lo, hi)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_self_pairs_match_bruteforce(spark, d):
    from duckdb_imputation_spark.operators.fuzzyjoin import fuzzy_self_pairs

    rng = random.Random(100 + d)
    vals = _random_strings(rng, 60)
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in fuzzy_self_pairs(df, "id", "s", max_distance=d).collect()
    }
    want = set()
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            dist = _lev(vals[i], vals[j])
            if dist <= d:
                want.add((i, j, dist))
    assert got == want


def test_fuzzy_join_two_tables(spark):
    from duckdb_imputation_spark.operators.fuzzyjoin import fuzzy_join

    left = spark.createDataFrame(
        [(1, "smith"), (2, "jones"), (3, "ab")], "lid long, name string"
    )
    right = spark.createDataFrame(
        [(10, "smyth"), (11, "stone"), (12, "jones"), (13, "ab")],
        "rid long, name string",
    )
    got = {
        (r["lid"], r["rid"], r["distance"])
        for r in fuzzy_join(
            left, right, "name", "name", "lid", "rid", max_distance=1
        ).collect()
    }
    # smith~smyth (1 sub), jones==jones (0); "ab" excluded by
    # min_length=3 even though it matches exactly
    assert got == {(1, 10, 1), (2, 12, 0)}


def test_deletion_variants_shape(spark):
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.fuzzyjoin import deletion_variants

    df = spark.createDataFrame([("abc",)], "s string")
    (row,) = df.select(
        F.sort_array(deletion_variants(F.col("s"), 1)).alias("v")
    ).collect()
    assert row["v"] == sorted(["abc", "bc", "ac", "ab"])
    (row2,) = df.select(
        F.sort_array(deletion_variants(F.col("s"), 2)).alias("v")
    ).collect()
    assert row2["v"] == sorted(
        ["abc", "bc", "ac", "ab", "c", "b", "a"]
    )


def test_deletion_variants_rejects_bad_d(spark):
    from pyspark.sql import functions as F

    from duckdb_imputation_spark.operators.fuzzyjoin import deletion_variants

    with pytest.raises(ValueError, match="d in"):
        deletion_variants(F.lit("x"), 3)


def test_fuzzy_self_pairs_unicode_and_duplicates(spark):
    """Multi-byte characters count as single edit units (Levenshtein
    over codepoints on both engines), and exact-duplicate values — the
    hot-block case the sf1 rehearsal exercises at scale — produce
    every cross pair at distance 0."""
    from duckdb_imputation_spark.operators.fuzzyjoin import fuzzy_self_pairs

    rows = [
        (1, "héllo"),
        (2, "hállo"),   # one substitution (accented)
        (3, "héllo"),   # exact duplicate of 1
        (4, "wörld"),
        (5, "wörlds"),  # one insertion
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in fuzzy_self_pairs(df, "id", "s", max_distance=1).collect()
    }
    assert got == {(1, 2, 1), (1, 3, 0), (2, 3, 1), (4, 5, 1)}


def test_fuzzy_join_null_and_short_strings_excluded(spark):
    from duckdb_imputation_spark.operators.fuzzyjoin import fuzzy_self_pairs

    rows = [(1, None), (2, "ab"), (3, "abc"), (4, "abd")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_self_pairs(df, "id", "s", max_distance=1).collect()
    }
    assert got == {(3, 4)}


def test_fuzzy_max_block_caps_hot_variants(spark):
    """max_block drops only the over-cap variant blocks: heavy exact
    duplicates stop pairing, distinct near-pairs survive."""
    from duckdb_imputation_spark.operators.fuzzyjoin import fuzzy_self_pairs

    # 8 exact copies of "aaaa" (hot block) + one distinct near pair
    rows = [(i, "aaaa") for i in range(8)] + [(10, "xyzw"), (11, "xyzq")]
    df = spark.createDataFrame(rows, "id long, s string")
    exact = fuzzy_self_pairs(df, "id", "s", max_distance=1)
    assert exact.count() == 28 + 1  # C(8,2) dup pairs + the near pair
    capped = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_self_pairs(
            df, "id", "s", max_distance=1, max_block=5
        ).collect()
    }
    assert capped == {(10, 11)}


def test_variant_block_stats_quantifies_cap_drop(spark):
    """The diagnostic reports exactly what max_block would drop —
    visibility for the recall trade (bucket_skew_stats' mirror)."""
    from duckdb_imputation_spark.operators.fuzzyjoin import (
        fuzzy_self_pairs,
        variant_block_stats,
    )

    rows = [(i, "hotname") for i in range(30)] + [
        (100 + i, f"cold{i:02d}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    stats = variant_block_stats(df, "name", cap=25)
    # the 30 identical names share every variant block of "hotname"
    # (len 7 -> 8 variant blocks of size >= 30); cold names are unique
    assert stats["max_block_size"] >= 30
    assert stats["dropped_blocks"] >= 8
    assert stats["dropped_rows"] >= 8 * 30
    # uncapped: no drop keys present
    stats2 = variant_block_stats(df, "name")
    assert "dropped_blocks" not in stats2
    assert stats2["blocks"] > 0
    # and the capped join's recall loss is exactly the hot-key pairs:
    capped = fuzzy_self_pairs(df, "id", "name", max_block=25)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert not any(a < 30 and b < 30 for a, b in got)  # hot pairs gone
