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
from pyspark.sql import functions as F

__all__ = [
    "streaming_upsert_sink",
    "streaming_sketch_sink",
    "streaming_countmin_sink",
    "streaming_rollup_sink",
    "streaming_bloom_sink",
    "streaming_retention_sink",
    "streaming_scd2_sink",
    "scd2_read",
    "streaming_components_sink",
]


def _state_exists(spark, path: str) -> bool:
    """True iff the persisted sink state at ``path`` exists.

    The stateful sinks fall back to ``mode("overwrite")`` only on a
    genuinely absent state table (first micro-batch ever).  That
    decision must NOT ride a bare ``except`` around the read: a
    transient read failure (FS hiccup, concurrent staged swap) would
    masquerade as "no state yet" and the overwrite would silently
    destroy all accumulated state.  An explicit Hadoop-FS existence
    probe separates "not there" from "there but unreadable" — the
    latter propagates, so the micro-batch fails and Structured
    Streaming retries it instead of wiping state.

    A crash INSIDE ``upsert_table``'s staged swap (between its two
    renames) leaves the state only in the ``__upsert_backup`` dir with
    the table path absent — that is existing state too, so the swap is
    rolled forward/back FIRST (``recover_interrupted_swap``, the same
    preamble upsert_table itself runs); only then is absence
    meaningful."""
    from ..sources import recover_interrupted_swap

    recover_interrupted_swap(path, kind="upsert")
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


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


def streaming_countmin_sink(
    stream: DataFrame,
    path: str,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
    checkpoint: str | None = None,
):
    """Continuously maintain a persisted count-min FREQUENCY sketch
    (operators/sketches.py) from a stream: per micro-batch, sketch the
    batch (bounded at depth*width cells no matter the batch size),
    merge it into the stored state for ONLY the cells the batch touches
    (left-semi read), and upsert those delta-sized rows through the
    crash-safe staged swap.  Old data is never rescanned.  Returns the
    writer (caller picks the trigger).

    Recovery note — the honest difference from the HLL sink: CM merge
    is cell-wise ADDITION, so replaying a batch double-counts (unlike
    the HLL register max, which is idempotent).  A ``checkpoint`` dir
    is therefore REQUIRED for exactly-once estimates, not just for the
    row tally; without one, estimates after a crash are an upper bound
    (CM errors are one-sided already, so over-count stays over-count)."""
    from ..operators.sketches import countmin_sketch, merge_countmin
    from ..sources import upsert_table

    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        bsk = countmin_sketch(
            batch, value_col, depth=depth, width=width, weight_col=weight_col
        )
        # existence-probed, not try/except: a transient read error must
        # fail the micro-batch (retry), never overwrite accumulated state
        if _state_exists(spark, path):
            state = spark.read.parquet(path).select("row", "bucket", "cnt")
        else:
            state = None
        if state is not None:
            touched = state.join(
                bsk.select("row", "bucket"), on=["row", "bucket"], how="left_semi"
            )
            merged = merge_countmin(touched, bsk)
        else:
            merged = bsk
        keyed = merged.withColumn(
            "__key", F.concat_ws("|", F.col("row"), F.col("bucket"))
        )
        if state is not None:
            upsert_table(spark, path, keyed, "__key")
        else:
            keyed.write.mode("overwrite").parquet(path)

    writer = stream.writeStream.foreachBatch(apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def streaming_sketch_sink(
    stream: DataFrame,
    path: str,
    value_col: str,
    by_cols=(),
    lgk: int = 12,
    checkpoint: str | None = None,
):
    """Continuously maintain a persisted HLL distinct-count state table
    (operators/sketches.py) from a stream: per micro-batch, sketch the
    batch, merge it into the stored state for ONLY the groups the batch
    touches (left-semi read), and upsert those delta-sized rows through
    the crash-safe staged swap.  Old data is never rescanned — the whole
    point of mergeable sketch state.  Returns the writer (caller picks
    the trigger).

    Recovery note: re-merging a replayed batch is IDEMPOTENT for the
    distinct estimate (HLL register max of a set with itself is itself),
    so estimates converge exactly after any crash/replay; the ``n_rows``
    tally is at-least-once under replay — pair with ``checkpoint`` for
    exactly-once row counts."""
    from ..operators.sketches import distinct_sketch, merge_distinct_sketches
    from ..sources import upsert_table

    by = list(by_cols)

    def key_expr():
        if not by:
            return F.lit("__all__")
        return F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in by]
        )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        bsk = distinct_sketch(batch, value_col, by, lgk)
        # existence-probed, not try/except — see _state_exists
        if _state_exists(spark, path):
            state = spark.read.parquet(path).select(*by, "sketch", "n_rows")
        else:
            state = None
        if state is not None:
            touched = state.join(bsk.select(*by), on=by, how="left_semi") if by else state
            merged = merge_distinct_sketches(touched, bsk, by_cols=by)
        else:
            merged = bsk
        keyed = merged.withColumn("__key", key_expr())
        if state is not None:
            upsert_table(spark, path, keyed, "__key")
        else:
            keyed.write.mode("overwrite").parquet(path)

    writer = stream.writeStream.foreachBatch(apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def streaming_rollup_sink(
    stream: DataFrame,
    path: str,
    key_cols,
    aggs: dict,
    checkpoint: str | None = None,
):
    """Continuously maintain a persisted rollup table (the hypertable
    "continuous aggregate" pattern): per micro-batch, aggregate the
    batch by ``key_cols`` (typically a time bucket + dimensions), merge
    into the stored state for ONLY the touched keys (left-semi read),
    and upsert those delta-sized rows through the crash-safe staged
    swap.  Old buckets are never rescanned; the per-batch cost is
    O(|batch| + touched-buckets), independent of table age.

    ``aggs`` maps output column -> ("count" | "sum" | "min" | "max",
    input column; the input column is ignored for "count") or
    ("first" | "last", (ts_col, value_col)).  Only MERGEABLE
    aggregates are accepted — count and sum re-merge by sum, min/max
    by themselves, and first/last as struct-ordered min/max over
    (ts, value): the stored cell is a ``struct<t, v>`` whose merge is
    associative AND idempotent (min of mins), read the value back as
    ``out.v``.  That makes a continuous OHLC rollup (the persisted
    face of ``operators.timeseries.resample_agg``) expressible:
    ``{"v_open": ("first", ("t", "v")), "v_close": ("last", ("t",
    "v")), ...}``.  avg = sum/count at read time.  NULL values are
    excluded from first/last (SQL aggregate semantics); ties on ts
    break lexicographically on (ts, value), same rule as
    ``resample_agg(deterministic=True)`` — and the same SortAggregate
    note applies to the micro-batch aggregate (spill-safe, still
    partial+final).

    Recovery note: like the count-min sink (and unlike HLL register
    max), count/sum merges are additive, so replaying a batch
    double-counts — pair with a ``checkpoint`` dir for exactly-once.
    min/max/first/last ARE idempotent under replay."""
    from ..sources import upsert_table

    keys = list(key_cols)
    merge_fn = {
        "count": F.sum,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "first": F.min,
        "last": F.max,
    }
    for out, (kind, spec) in aggs.items():
        if kind not in merge_fn:
            raise ValueError(
                f"{out}: {kind!r} is not a mergeable rollup aggregate "
                "(use count/sum/min/max/first/last; derive avg as "
                "sum/count)"
            )
        if kind in ("first", "last") and (
            not isinstance(spec, (tuple, list)) or len(spec) != 2
        ):
            raise ValueError(
                f"{out}: {kind} needs (ts_col, value_col), got {spec!r}"
            )

    def batch_exprs():
        exprs = []
        for out, (kind, col) in aggs.items():
            if kind == "count":
                exprs.append(F.count(F.lit(1)).cast("long").alias(out))
            elif kind in ("first", "last"):
                ts_c, v_c = col
                nn = F.when(
                    F.col(v_c).isNotNull(),
                    F.struct(
                        F.col(ts_c).alias("t"), F.col(v_c).alias("v")
                    ),
                )
                agg = F.min(nn) if kind == "first" else F.max(nn)
                exprs.append(agg.alias(out))
            else:
                exprs.append(getattr(F, kind)(col).alias(out))
        return exprs

    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        b = batch.groupBy(*keys).agg(*batch_exprs())
        # existence-probed, not try/except — see _state_exists
        if _state_exists(spark, path):
            state = spark.read.parquet(path).select(*keys, *aggs)
        else:
            state = None
        if state is not None:
            touched = state.join(b.select(*keys), on=keys, how="left_semi")
            merged = (
                touched.unionByName(b)
                .groupBy(*keys)
                .agg(
                    *[
                        merge_fn[kind](out).alias(out)
                        for out, (kind, _) in aggs.items()
                    ]
                )
            )
        else:
            merged = b
        keyed = merged.withColumn(
            "__key",
            F.concat_ws(
                "\x1f",
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in keys],
            ),
        )
        if state is not None:
            upsert_table(spark, path, keyed, "__key")
        else:
            keyed.write.mode("overwrite").parquet(path)

    writer = stream.writeStream.foreachBatch(apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def streaming_bloom_sink(
    stream: DataFrame,
    path: str,
    value_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
    checkpoint: str | None = None,
):
    """Continuously maintain a persisted Bloom filter
    (operators/sketches.py bloom_build) from a stream: per micro-batch,
    filter the batch's values into word rows (bounded at m_bits/64 no
    matter the batch size), bitwise-OR into the stored state for ONLY
    the words the batch touches (left-semi read), and upsert those
    delta-sized rows through the crash-safe staged swap.  Old data is
    never rescanned — the membership state accumulates forever.

    Recovery note: Bloom merge is bitwise OR, so replaying a batch is
    IDEMPOTENT (like the HLL register max, unlike the additive
    count-min/rollup sinks) — estimates converge exactly after any
    crash/replay even WITHOUT a checkpoint dir; pass one anyway to
    avoid reprocessing cost."""
    from ..operators.sketches import bloom_build, merge_bloom
    from ..sources import upsert_table

    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        bf = bloom_build(batch, value_col, m_bits=m_bits, k_hashes=k_hashes)
        # existence-probed, not try/except — see _state_exists
        has_state = _state_exists(spark, path)
        if has_state:
            state = spark.read.parquet(path).select("word", "bits")
            touched = state.join(bf.select("word"), "word", "left_semi")
            merged = merge_bloom(touched, bf)
        else:
            merged = bf
        keyed = merged.withColumn("__key", F.col("word").cast("string"))
        if has_state:
            upsert_table(spark, path, keyed, "__key")
        else:
            keyed.write.mode("overwrite").parquet(path)

    writer = stream.writeStream.foreachBatch(apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def streaming_retention_sink(
    stream: DataFrame,
    path: str,
    entity_col: str,
    ts_col: str = "ts",
    period_us: int = 7 * 86_400 * 1_000_000,
    checkpoint: str | None = None,
):
    """Continuously maintain the DEDUPLICATED (entity, period) activity
    table that backs a cohort-retention matrix
    (operators/timeseries.py retention_from_periods reads it): per
    micro-batch, reduce the batch to its distinct integer
    (entity, period) pairs and upsert them keyed on the pair.

    The state is a SET, so the merge is idempotent — re-upserting a
    pair writes the identical row (Bloom-sink class replay safety:
    crash/replay converges exactly even without a checkpoint dir,
    unlike the additive count-min/rollup sinks; DISTINCT metrics
    survive replay precisely because the state stores membership, not
    counts).  The upsert is partition-scoped on ``period``: a
    micro-batch touches only the periods it contains, so old periods
    are never rewritten and state grows as |entities| x |active
    periods| — the same bound the batch operator's dedup-first shape
    guarantees.

    Read side: ``retention_from_periods(spark.read.parquet(path),
    "entity", "period")`` — the matrix is recomputed from the compact
    state, never from raw history."""
    from ..sources import upsert_table_partitioned

    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        ep = F.unix_micros(F.col(ts_col).cast("timestamp"))
        pairs = (
            batch.where(
                F.col(entity_col).isNotNull() & F.col(ts_col).isNotNull()
            )
            .select(
                F.col(entity_col).cast("string").alias("entity"),
                F.floor(ep / F.lit(int(period_us)))
                .cast("long")
                .alias("period"),
            )
            .distinct()
        )
        keyed = pairs.withColumn(
            "__key",
            F.concat_ws("|", F.col("entity"), F.col("period").cast("string")),
        )
        # existence-probed, not try/except — see _state_exists
        if _state_exists(spark, path):
            upsert_table_partitioned(spark, path, keyed, "__key", "period")
        else:
            keyed.write.partitionBy("period").mode("overwrite").parquet(path)

    writer = stream.writeStream.foreachBatch(apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def streaming_scd2_sink(
    stream: DataFrame,
    path: str,
    key_cols,
    tracked_cols,
    ts_col: str,
    close_period_us: int = 7 * 86_400 * 1_000_000,
    checkpoint: str | None = None,
):
    """Continuously maintain an SCD2 history table
    (operators/scd.py :func:`~..operators.scd.scd2_apply` per
    micro-batch) — versioned pipeline metadata that stays current as
    observations stream in.

    State layout (two sub-tables under ``path``, read back with
    :func:`scd2_read`):

    * ``path/current`` — each key's OPEN version (``valid_to`` NULL),
      overwritten per touched batch: O(keys), never O(history);
    * ``path/closed`` — closed versions, UPSERTED keyed on
      (key, valid_from) and partitioned on
      ``floor(valid_to / close_period_us)`` — a batch only rewrites
      the periods it closes rows into (recent ones), old periods'
      files are never touched.

    Replay safety (the retention-sink class, by construction rather
    than by checkpoint): updates with ``ts_col`` <= the key's current
    ``valid_from`` are DROPPED (the monotone guard — SCD2 appends
    versions; out-of-order history rewrites are a different
    operation), so re-delivering a processed batch finds every update
    stale-or-equal and converges: the closed upsert rewrites identical
    rows, the current overwrite writes the identical slice.  The
    closed upsert runs FIRST so a crash between the two writes also
    replays to the same state.

    Per-batch cost: O(batch + current + touched closed periods) —
    independent of total history age."""
    from ..operators.scd import scd2_apply
    from ..sources import upsert_table_partitioned

    keys = list(key_cols)
    tracked = list(tracked_cols)
    cur_path = f"{path}/current"
    closed_path = f"{path}/closed"

    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        upd = batch.select(*keys, *tracked, ts_col).where(
            F.col(ts_col).isNotNull()
        )
        for k in keys:
            upd = upd.where(F.col(k).isNotNull())
        if _state_exists(spark, cur_path):
            current = spark.read.parquet(cur_path)
            # monotone guard: drop updates at/before the key's open
            # version — makes replay a no-op and stale deliveries safe
            guard = current.select(
                *keys, F.col("valid_from").alias("__cur_from")
            )
            upd = (
                upd.join(guard, keys, "left")
                .where(
                    F.col("__cur_from").isNull()
                    | (F.col(ts_col) > F.col("__cur_from"))
                )
                .drop("__cur_from")
            )
            if not upd.head(1):
                return
            merged = scd2_apply(current, upd, keys, tracked, ts_col)
        else:
            current = None
            merged = scd2_apply(None, upd, keys, tracked, ts_col)
        # eager localCheckpoint: one computation feeds both writes AND
        # severs lineage from the current-slice files about to be
        # overwritten (writing over your own lazy input corrupts)
        merged = merged.localCheckpoint()
        # the current slice never holds closed rows, so every
        # valid_to-bearing row in `merged` was closed THIS batch
        newly_closed = merged.where(F.col("valid_to").isNotNull())
        if newly_closed.head(1):
            keyed = newly_closed.withColumn(
                "__key",
                F.concat_ws(
                    "|",
                    *[F.col(k).cast("string") for k in keys],
                    F.col("valid_from").cast("string"),
                ),
            ).withColumn(
                "__period",
                F.floor(
                    F.col("valid_to").cast("double")
                    / F.lit(float(close_period_us))
                ).cast("long"),
            )
            if _state_exists(spark, closed_path):
                upsert_table_partitioned(
                    spark, closed_path, keyed, "__key", "__period"
                )
            else:
                keyed.write.partitionBy("__period").mode(
                    "overwrite"
                ).parquet(closed_path)
        merged.where(F.col("valid_to").isNull()).write.mode(
            "overwrite"
        ).parquet(cur_path)

    writer = stream.writeStream.foreachBatch(apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def scd2_read(spark, path: str) -> DataFrame:
    """The full SCD2 history maintained by :func:`streaming_scd2_sink`:
    closed versions ∪ the current slice (drop the sink's internal
    ``__key``/``__period`` columns)."""
    cur = spark.read.parquet(f"{path}/current")
    closed_path = f"{path}/closed"
    if _state_exists(spark, closed_path):
        closed = spark.read.parquet(closed_path).drop("__key", "__period")
        return closed.select(*cur.columns).unionByName(cur)
    return cur


def streaming_components_sink(
    stream: DataFrame,
    path: str,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 64,
    checkpoint: str | None = None,
):
    """Continuously maintain a connected-components (dedup-cluster /
    entity-resolution) table as edges stream in: per micro-batch,
    :func:`~..operators.graph.incremental_components` computes new
    labels for ONLY the affected nodes (batch endpoints + members of
    any component they touch), then upserts them keyed on node into a
    state table partitioned on ``pmod(node, n_buckets)`` — a STABLE
    partition key (a node's bucket never changes even when its
    component does), so a batch rewrites at most the buckets its
    affected nodes hash into.

    Per-batch cost: O(batch + touched components + affected buckets) —
    independent of the graph's total age.  Replay safety: the merge is
    idempotent by construction (re-delivering a processed batch finds
    every component already merged and rewrites identical rows), so a
    crash/replay converges without relying on the checkpoint.  Read
    the mapping back with ``spark.read.parquet(path)`` (columns node,
    component, plus the sink's __key/__bucket internals)."""
    from ..operators.graph import incremental_components
    from ..sources import upsert_table_partitioned

    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        if _state_exists(spark, path):
            state = spark.read.parquet(path).select("node", "component")
        else:
            state = None
        delta = incremental_components(state, batch, src, dst)
        if not delta.head(1):
            return
        keyed = delta.withColumn(
            "__key", F.col("node").cast("string")
        ).withColumn(
            "__bucket", F.pmod(F.hash("node"), F.lit(int(n_buckets)))
        )
        if state is not None:
            upsert_table_partitioned(spark, path, keyed, "__key", "__bucket")
        else:
            keyed.write.partitionBy("__bucket").mode("overwrite").parquet(
                path
            )

    writer = stream.writeStream.foreachBatch(apply)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
