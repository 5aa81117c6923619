"""Data sources: the driver's testdata star schema and generic readers.

Equivalent of the reference's scan surface (SURVEY §2.3): CSV with
header/auto-detect (main.cpp:53 ``read_csv(..., AUTO_DETECT)``) →
``spark.read.csv(header, inferSchema)``; in-memory fixtures →
``createDataFrame``; plus parquet/json, which Spark gives natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

__all__ = [
    "recover_interrupted_swap",
    "TABLES",
    "load_tables",
    "load_table",
    "read_csv_auto",
    "write_table",
    "write_bucketed_table",
    "compact_table",
    "upsert_table",
    "upsert_table_partitioned",
    "register_view",
    "read_binary_dir",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped with two ts encodings across driver
        # drops: TIMESTAMP(NANOS) (which Spark's reader only accepts as a
        # long via the legacy flag) and plain timestamp[us] (read as
        # TIMESTAMP_NTZ). Normalize both to a session-TZ timestamp — the
        # session is pinned to UTC (session.py:31), so the NTZ cast keeps
        # the same wall clock DuckDB sees.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # Integer division, not double: at ~1.7e18 ns a double has
            # 256 ns of precision, which lands ~13% of rows on a different
            # microsecond than DuckDB's integer CAST truncation.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_csv_auto(spark: SparkSession, path: str, **options) -> DataFrame:
    """CSV with header + type auto-detection (the reference's read_csv)."""
    opts = {"header": "true", "inferSchema": "true", **options}
    return spark.read.options(**opts).csv(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Sink surface (the reference's CREATE TABLE ... AS SELECT,
    e.g. imputation_low.cpp:140).  ``partition_by`` maps hot filter
    columns to physical partition pruning at read time."""
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def register_view(df: DataFrame, name: str) -> None:
    """CREATE OR REPLACE (temp) VIEW — the lightweight sink the MICE
    loops use between rounds."""
    df.createOrReplaceTempView(name)


def recover_interrupted_swap(path: str, kind: str = "upsert") -> None:
    """Roll an interrupted staged swap forward or back (shared preamble
    of :func:`compact_table` / :func:`upsert_table`): a crash between
    the two renames leaves ONLY the backup dir (POSIX has no atomic
    two-directory swap) — restore it, because it holds the complete
    pre-swap data; backup AND table both present means the swap
    completed — drop the stale backup.  Safe to call at any time
    (no-op without a backup); stateful sinks call it BEFORE probing
    for state existence, so a swap-crash never masquerades as "no
    state yet" (which would overwrite all accumulated state with
    batch-only data)."""
    import os
    import shutil

    staging = path.rstrip("/") + f"__{kind}_staging"
    backup = path.rstrip("/") + f"__{kind}_backup"
    if os.path.exists(backup):
        if not os.path.exists(path):
            os.rename(backup, path)
        else:
            shutil.rmtree(backup)  # swap completed; stale backup
    if os.path.exists(staging):
        shutil.rmtree(staging)  # incomplete staging from a crashed run


def compact_table(
    spark: SparkSession, path: str, target_files: int, fmt: str = "parquet"
) -> int:
    """Small-files compaction: rewrite a table directory into
    ``target_files`` files (staging dir + rename swap).  The operational
    companion to streaming/incremental sinks — thousands of micro-batch
    part files regress scan parallelism bookkeeping and parquet footer
    overhead at scale.  Returns the file count after compaction.

    Crash safety: a crash can interrupt between the two renames, leaving
    only the backup dir (POSIX offers no atomic two-directory swap) —
    the next call detects that state and restores the source before
    compacting, so no committed data is ever lost and the operation is
    safely re-runnable."""
    import os
    import shutil

    staging = path.rstrip("/") + "__compact_staging"
    backup = path.rstrip("/") + "__compact_backup"
    recover_interrupted_swap(path, kind="compact")
    df = spark.read.format(fmt).load(path)
    df.repartition(target_files).write.format(fmt).mode("overwrite").save(staging)
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except Exception:
        os.rename(backup, path)  # roll back
        raise
    shutil.rmtree(backup)
    return sum(1 for f in os.listdir(path) if f.endswith((".parquet", ".orc", ".json")))


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (hash-clustered) managed table.

    The 100 TB co-location path: two tables bucketed on the same join key
    with the same bucket count sort-merge-join WITHOUT a shuffle on
    either side (the scan itself reports the hash partitioning), turning
    the biggest repeated cost of fact-fact joins — re-shuffling both
    inputs per query — into a one-time write-side layout decision.
    Optional ``sort_cols`` additionally pre-sorts within buckets so the
    merge needs no sort either."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(name)


def upsert_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str,
    fmt: str = "parquet",
) -> int:
    """Keyed upsert into a table directory: rows whose ``key_col``
    appears in ``updates`` are replaced, new keys are appended — the
    MERGE sink an incremental corpus needs (pair with
    ``minhash_index.dedup_new``: dedup a batch against the index, then
    upsert the survivors).

    Implementation is read → anti-join (AQE broadcasts a small update
    set on its own) → union → staged rewrite reusing
    :func:`compact_table`'s crash-safe two-rename swap, including its
    backup-recovery preamble — a crash between renames is detected and
    rolled forward/back on the next call, so committed data survives
    any single failure.  Returns the row count after the upsert.

    At 100 TB prefer a PARTITIONED table and upsert partition-by-
    partition (read only affected partitions); this whole-table form is
    the correct small/medium building block and the semantics oracle.
    """
    import os
    import shutil

    staging = path.rstrip("/") + "__upsert_staging"
    backup = path.rstrip("/") + "__upsert_backup"
    recover_interrupted_swap(path, kind="upsert")
    current = spark.read.format(fmt).load(path)
    kept = current.join(
        updates.select(key_col).distinct(), key_col, "left_anti"
    )
    merged = kept.unionByName(updates.select(*current.columns))
    merged.write.format(fmt).mode("overwrite").save(staging)
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except Exception:
        os.rename(backup, path)
        raise
    shutil.rmtree(backup)
    return spark.read.format(fmt).load(path).count()


def upsert_table_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str,
    partition_col: str,
    fmt: str = "parquet",
) -> int:
    """The 100 TB upsert: only partitions that actually contain updated
    keys are read and rewritten.

    1. the update set's distinct partition values are collected (small
       by assumption — an update batch touches few partitions),
    2. the current table is read WITH a partition filter (physical
       pruning — untouched partitions are never opened),
    3. merged rows overwrite ONLY those partitions via dynamic
       partition overwrite; every other partition's files are untouched
       on disk.

    Requires the table to be partitioned by ``partition_col``
    (``write_table(..., partition_by=[...])``) and every update row to
    carry its partition value.  Returns rows written (the rewritten
    partitions' new row count)."""
    from pyspark.sql import functions as F

    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not parts:
        return 0
    current = (
        spark.read.format(fmt)
        .load(path)
        .filter(F.col(partition_col).isin(parts))
    )
    kept = current.join(
        updates.select(key_col).distinct(), key_col, "left_anti"
    )
    merged = kept.unionByName(updates.select(*current.columns))
    n = merged.count()
    (
        merged.write.format(fmt)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .save(path)
    )
    return n


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest raw files as rows — the standard multimodal landing path
    (image / audio / video files on distributed storage become a binary
    column plus file metadata, ready for operators/multimodal.py):

        (path string, modificationTime timestamp, length long,
         content binary)

    Wraps Spark's ``binaryFile`` source, so ingestion is distributed,
    partitioned by Spark's file-splitting policy (one file per row;
    files are never split), and filter-pushdown applies to the metadata
    columns — a ``length <= N`` filter prunes oversized blobs BEFORE
    their bytes are read (``max_bytes`` wires that in directly).
    ``glob`` narrows the listing (e.g. ``*.ppm``)."""
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df
