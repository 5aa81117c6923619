"""Z-order (Morton) clustering — multi-column data layout for scan
pruning.

Partition pruning (sources.write_table ``partition_by``) only helps the
ONE leading column; at 100 TB a second selective column still reads
every file.  Z-ordering interleaves the bits of several columns' scaled
values into one sort key, so files hold small multi-dimensional
bounding boxes and parquet min/max stats prune on EVERY participating
column (the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

Everything is Column arithmetic (bit shifts/masks — whole-stage
codegen); the only driver-side work is one min/max aggregate per column
when bounds are not supplied.  The write path is
``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` — ONE range
shuffle whose cost you pay once at layout time and save on every
subsequent selective scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_write", "zorder_sql", "column_bounds"]


def column_bounds(df: DataFrame, cols: Sequence[str]) -> dict[str, tuple[float, float]]:
    """One tiny scalar aggregate: (min, max) per column."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs).first()
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def zorder_value(
    cols: Sequence[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
) -> Column:
    """The Morton key: each column scaled to an integer in
    ``[0, 2^bits)`` within its (min, max) bounds (clamped outside), bits
    interleaved column-major (bit b of column i lands at position
    ``b * n_cols + i``).  Deterministic given the same bounds — pin
    bounds in metadata for reproducible layouts."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = (float(x) for x in bounds[c])
        span = (mx - mn) or 1.0
        scaled = F.least(
            F.lit((1 << bits) - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn))
                    / F.lit(span)
                    * F.lit(float((1 << bits) - 1) + 0.9999)
                ).cast("long"),
            ),
        )
        for b in range(bits):
            bit = F.shiftright(scaled, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
    fmt: str = "parquet",
) -> dict[str, tuple[float, float]]:
    """Write ``df`` z-ordered on ``cols`` into ``n_files`` range-split
    files.  Returns the bounds used (persist them to reproduce the
    layout for appends)."""
    if bounds is None:
        bounds = column_bounds(df, cols)
    z = zorder_value(cols, bounds, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(int(n_files), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
    return bounds


def zorder_sql(
    col_exprs: Sequence[str],
    bounds: Sequence[tuple[float, float]],
    bits: int = 16,
) -> str:
    """DuckDB twin of :func:`zorder_value` (same scaling, clamping and
    bit interleave) — the catalog oracle."""
    n = len(col_exprs)
    parts = []
    for i, (expr, (mn, mx)) in enumerate(zip(col_exprs, bounds)):
        span = (mx - mn) or 1.0
        scaled = (
            f"LEAST({(1 << bits) - 1}, GREATEST(0, "
            f"CAST(FLOOR((CAST({expr} AS DOUBLE) - {mn!r}) / {span!r} "
            f"* {float((1 << bits) - 1) + 0.9999!r}) AS BIGINT)))"
        )
        for b in range(bits):
            parts.append(f"((({scaled} >> {b}) & 1) << {b * n + i})")
    return "(" + " | ".join(parts) + ")"
