"""Streaming near-duplicate detection (MinHash-LSH over a stream).

Batch LSH dedup (operators/dedup.py) buckets the whole corpus at once;
a stream needs per-bucket *state*: each (band, bucket) key remembers the
signatures it has seen and every arriving document is compared against
them.  This is the standard streaming-LSH compromise:

* candidates are found per band bucket (same blocking as batch);
* similarity is estimated from the MinHash signatures themselves
  (fraction of matching slots — an unbiased Jaccard estimator), because
  keeping shingle sets in state would make state O(corpus text);
* state per bucket is capped at ``state_cap`` signatures (FIFO) and
  expired by an event-time timeout at the watermark horizon, so total
  state is O(buckets × cap × k) longs — bounded, like the batch
  ``bucket_cap`` guard;
* output is append-mode candidate pairs (earlier_id, later_id,
  est_jaccard, band); the same pair surfacing from several bands is
  deduped downstream (batch `dropDuplicates` or exact re-verify).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..operators.dedup import minhash_signature_from_shingles
from ..operators.hashing import shingles

__all__ = ["streaming_minhash_pairs", "PAIR_SCHEMA"]

PAIR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("est_jaccard", DoubleType()),
        StructField("band", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("sigs", ArrayType(LongType())),  # k slots per id, flat
        # high-water event time (µs) across ALL batches seen by this
        # bucket — keeps the expiry timeout monotone when a later batch
        # carries only older (out-of-order) events
        StructField("max_ts", LongType()),
    ]
)


def streaming_minhash_pairs(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    k: int = 16,
    bands: int = 4,
    shingle: int = 5,
    threshold: float = 0.5,
    state_cap: int = 128,
    watermark: str = "1 hour",
    horizon_seconds: int = 3600,
) -> DataFrame:
    """Candidate near-duplicate pairs over a stream of (id, text, ts).

    A document pairs with every earlier document that shares one of its
    ``bands`` LSH buckets and whose signatures agree on ≥ ``threshold``
    of the k MinHash slots.  Bucket state expires ``horizon_seconds``
    after the newest arrival in that bucket (driven by the watermark).
    """
    assert k % bands == 0
    rows_per = k // bands
    sig = minhash_signature_from_shingles(
        F.array_distinct(shingles(F.col(text_col), shingle)), k
    )
    slim = stream.select(
        F.col(id_col).alias("__id"),
        F.col(ts_col),
        sig.alias("__sig"),
    ).select(
        "__id",
        ts_col,
        "__sig",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[F.element_at("__sig", b * rows_per + r + 1) for r in range(rows_per)],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__bucket"),
    )

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0])
        if state.hasTimedOut:
            if state.exists:
                state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values("__id")
        if state.exists:
            ids, sigs, prev_max_ts = state.get
            ids, sigs = list(ids), list(sigs)
            max_ts_us = int(prev_max_ts or 0)
        else:
            ids, sigs = [], []
            max_ts_us = 0
        out = {"id_a": [], "id_b": [], "est_jaccard": [], "band": []}
        for _, r in rows.iterrows():
            new_sig = [int(x) for x in r["__sig"]]
            new_id = int(r["__id"])
            max_ts_us = max(max_ts_us, int(pd.Timestamp(r[ts_col]).value // 1000))
            for pos, old_id in enumerate(ids):
                if old_id == new_id:
                    continue
                old = sigs[pos * k : (pos + 1) * k]
                est = sum(1 for a, b in zip(old, new_sig) if a == b) / k
                if est >= threshold:
                    a, b = sorted((old_id, new_id))
                    out["id_a"].append(a)
                    out["id_b"].append(b)
                    out["est_jaccard"].append(round(est, 6))
                    out["band"].append(band)
            ids.append(new_id)
            sigs.extend(new_sig)
            if len(ids) > state_cap:  # FIFO eviction keeps state bounded
                ids = ids[-state_cap:]
                sigs = sigs[-state_cap * k :]
        state.update((ids, sigs, max_ts_us))
        # max_ts_us is seeded from state, so the timeout never moves
        # backwards when a batch arrives with only out-of-order events
        state.setTimeoutTimestamp(max_ts_us // 1000 + horizon_seconds * 1000)
        if out["id_a"]:
            yield pd.DataFrame(out)

    return (
        slim.withWatermark(ts_col, watermark)
        .groupBy("__band", "__bucket")
        .applyInPandasWithState(
            fn,
            outputStructType=PAIR_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
