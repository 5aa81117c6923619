#!/usr/bin/env python
"""Generate an Nx scale-up of the sf0.1 testdata (default 10x into
.data/sf1; SPARK_GRAFT_REPLICA_REPS / SPARK_GRAFT_SF1_DIR override —
e.g. REPS=100 DST=.data/sf10 builds the 100x replica) for the
scale rehearsal (VERDICT r1 #9): fact tables are replicated Nx with
foreign keys shifted consistently per replica, dimension tables are kept
as-is.  Distributions (and therefore per-row operator cost) match sf0.1;
only the volume grows, which is exactly what a throughput rehearsal
needs."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from duckdb_imputation_spark.session import get_spark


SRC = os.environ.get("SPARK_GRAFT_REPLICA_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.data/sf1")
REPS = int(os.environ.get("SPARK_GRAFT_REPLICA_REPS", "10"))

# table -> columns to shift by replica * (max+1); dims replicate as-is
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]
# shared key spaces: the same stride per key family keeps FKs consistent
FAMILY = {
    "c_custkey": "cust", "o_custkey": "cust",
    "o_orderkey": "order", "l_orderkey": "order",
    "p_partkey": "part", "l_partkey": "part",
    "s_suppkey": "supp", "l_suppkey": "supp",
}


def _raw(spark, t):
    # events: pass ts through in whatever encoding the source drop uses
    # (nanos-as-long for older drops, timestamp[us] for newer ones);
    # load_table normalizes either at read time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SRC}/{t}.parquet")


def main() -> None:
    spark = get_spark("make-sf1")
    strides: dict[str, int] = {}
    for t, cols in SHIFT.items():
        df = _raw(spark, t)
        for c in cols:
            fam = FAMILY.get(c, c)
            if fam not in strides:
                strides[fam] = int(df.agg(F.max(c)).first()[0]) + 1
    for t in DIMS:
        _raw(spark, t).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    for t, cols in SHIFT.items():
        df = _raw(spark, t)
        rep = spark.range(REPS).withColumnRenamed("id", "__rep")
        out = df.crossJoin(rep)
        for c in cols:
            stride = strides[FAMILY.get(c, c)]
            out = out.withColumn(c, (F.col(c) + F.col("__rep") * stride).cast(df.schema[c].dataType))
        out.drop("__rep").write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(t, "->", f"{DST}/{t}.parquet")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
