"""Cross-engine deterministic hashing primitives.

Everything downstream (dedup, fingerprints, LSH) hashes through md5 so
the DuckDB oracle can reproduce results bit-for-bit: Spark's
``xxhash64``/``hash`` and DuckDB's ``hash`` are engine-private, md5 of
UTF-8 text is not.

  * 32-bit: first 8 hex chars  → BIGINT in [0, 2^32)
  * 60-bit: first 15 hex chars → BIGINT in [0, 2^60)  (sign-safe)

Spark: ``conv(substr(md5(x),1,n), 16, 10)``; DuckDB:
``CAST('0x' || substr(md5(x),1,n) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_int32", "md5_int60", "shingles", "ws_tokens", "ensure_parallelism"]


def ensure_parallelism(df, min_fraction: float = 0.5):
    """Repartition a DataFrame whose input is a few small files up to the
    cluster's default parallelism — CPU-bound per-row stages (shingling,
    hashing) otherwise serialize on one task.  No-op when the input is
    already well-partitioned (the 100 TB case), so the extra shuffle only
    happens when it is cheap by construction."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_fraction)):
        return df.repartition(target)
    return df


def md5_int32(col: Column, seed: str = "") -> Column:
    s = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def md5_int60(col: Column, seed: str = "") -> Column:
    s = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def md5_int32_sql(expr: str, seed: str = "") -> str:
    inner = f"CONCAT('{seed}', {expr})" if seed else expr
    return f"CAST('0x' || substr(md5({inner}), 1, 8) AS BIGINT)"


def md5_int60_sql(expr: str, seed: str = "") -> str:
    inner = f"CONCAT('{seed}', {expr})" if seed else expr
    return f"CAST('0x' || substr(md5({inner}), 1, 15) AS BIGINT)"


def shingles(col: Column, k: int) -> Column:
    """Character k-shingles (w-shingling): substrings of length k at every
    offset.  Shorter-than-k text yields the text itself."""
    c = col
    n = F.length(c)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(k)),
    )


def shingles_sql(expr: str, k: int) -> str:
    return (
        f"list_transform(range(1, GREATEST(length({expr}) - {k - 1}, 1) + 1), "
        f"i -> substr({expr}, CAST(i AS INT), {k}))"
    )


def ws_tokens(col: Column) -> Column:
    """Whitespace tokenization; empty (or NULL) string → empty array.
    NULL-coalescing here makes every downstream text operator null-safe
    with one shared semantic: no text ≡ no tokens."""
    c = F.trim(F.coalesce(col, F.lit("")))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def ws_tokens_sql(expr: str) -> str:
    e = f"trim(COALESCE({expr}, ''))"
    return (
        f"CASE WHEN length({e}) = 0 THEN [] "
        f"ELSE regexp_split_to_array({e}, '\\s+') END"
    )
