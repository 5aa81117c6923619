"""Streaming sinks: continuous corpus maintenance via ``foreachBatch``.

Structured Streaming's file sink is append-only; corpus maintenance
needs MERGE semantics (replace changed documents, add new ones).  The
standard production pattern is ``foreachBatch`` + a batch upsert — each
micro-batch applies transactionally through the crash-safe staged swap
in ``sources.upsert_table`` (or the partition-scoped variant, which at
scale rewrites only the partitions the batch touches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["streaming_upsert_sink"]


def streaming_upsert_sink(
    stream: DataFrame,
    path: str,
    key_col: str,
    partition_col: str | None = None,
    checkpoint: str | None = None,
    fmt: str = "parquet",
):
    """Start a streaming query that upserts every micro-batch into the
    table at ``path`` (keyed replace-or-append).  With ``partition_col``
    the partition-scoped upsert runs instead — only partitions present
    in the batch are rewritten.  Returns the ``StreamingQuery``.

    Exactly-once note: the swap itself is crash-safe and re-applying a
    batch is idempotent (same keys replace the same rows), so recovery
    after failure converges; pair with a ``checkpoint`` dir so batches
    replay from the last committed offset."""
    from ..sources import upsert_table, upsert_table_partitioned

    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        if partition_col is not None:
            upsert_table_partitioned(
                spark, path, batch, key_col, partition_col, fmt=fmt
            )
        else:
            upsert_table(spark, path, batch, key_col, fmt=fmt)

    writer = stream.writeStream.foreachBatch(apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
