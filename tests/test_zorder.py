"""Z-order layout: Morton key correctness vs a pure-Python reference,
and the physical payoff — per-file multi-column bounding boxes shrink
versus a naive single-column sort, which is what parquet min/max
pruning feeds on."""

import glob

import numpy as np
import pytest

from pyspark.sql import functions as F

from duckdb_imputation_spark.operators.zorder import (
    column_bounds,
    zorder_value,
    zorder_write,
)


def _py_morton(vals, bounds, bits):
    z = 0
    n = len(vals)
    for i, (v, (mn, mx)) in enumerate(zip(vals, bounds)):
        span = (mx - mn) or 1.0
        s = int((v - mn) / span * ((1 << bits) - 1 + 0.9999))
        s = max(0, min((1 << bits) - 1, s))
        for b in range(bits):
            z |= ((s >> b) & 1) << (b * n + i)
    return z


def test_zorder_value_matches_python_reference(spark):
    rng = np.random.default_rng(3)
    rows = [(float(a), float(b)) for a, b in rng.uniform(0, 100, size=(200, 2))]
    df = spark.createDataFrame(rows, "x double, y double")
    bounds = {"x": (0.0, 100.0), "y": (0.0, 100.0)}
    got = [
        r.z
        for r in df.select(
            zorder_value(["x", "y"], bounds, bits=10).alias("z")
        ).collect()
    ]
    want = [
        _py_morton(v, [bounds["x"], bounds["y"]], 10) for v in rows
    ]
    assert got == want


def test_zorder_value_clamps_and_caps(spark):
    df = spark.createDataFrame([(-5.0, 200.0)], "x double, y double")
    bounds = {"x": (0.0, 100.0), "y": (0.0, 100.0)}
    [r] = df.select(zorder_value(["x", "y"], bounds, bits=8).alias("z")).collect()
    assert r.z == _py_morton((-5.0, 200.0), [(0.0, 100.0)] * 2, 8)
    with pytest.raises(ValueError, match="exceeds a signed long"):
        zorder_value(["a", "b", "c", "d"], {c: (0, 1) for c in "abcd"}, bits=16)


def _file_ranges(path, cols):
    """Per parquet file: {col: (min, max)} from row-group statistics —
    exactly what a scan's file/row-group pruning consults."""
    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins = {c: np.inf for c in cols}
        maxs = {c: -np.inf for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    mins[name] = min(mins[name], col.statistics.min)
                    maxs[name] = max(maxs[name], col.statistics.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def _files_hit(ranges, col, lo, hi):
    return sum(1 for r in ranges if not (r[col][1] < lo or r[col][0] > hi))


def test_zorder_write_enables_second_column_pruning(spark, tmp_path):
    """A first-column sort leaves every file spanning v's full range, so
    a v-predicate prunes NOTHING; z-order constrains BOTH columns per
    file and a narrow v-window skips most files (u-pruning survives,
    coarser)."""
    rng = np.random.default_rng(11)
    rows = [(int(a), int(b)) for a, b in rng.integers(0, 10_000, size=(20_000, 2))]
    df = spark.createDataFrame(rows, "u long, v long")

    plain = str(tmp_path / "plain")
    df.repartitionByRange(16, "u").sortWithinPartitions("u").write.parquet(plain)
    zpath = str(tmp_path / "zord")
    bounds = zorder_write(df, zpath, ["u", "v"], n_files=16)
    assert set(bounds) == {"u", "v"}

    pr = _file_ranges(plain, ["u", "v"])
    zr = _file_ranges(zpath, ["u", "v"])
    # narrow window on the NON-leading column
    assert _files_hit(pr, "v", 4000, 4400) == len(pr)  # no pruning at all
    assert _files_hit(zr, "v", 4000, 4400) <= len(zr) // 2  # real pruning
    # leading-column pruning still works under z-order (coarser is fine)
    assert _files_hit(zr, "u", 100, 200) < len(zr)
    # and the data itself round-trips (layout only)
    back = spark.read.parquet(zpath).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("u").alias("su"), F.sum("v").alias("sv")
    ).first()
    assert back.n == len(rows)
    assert back.su == sum(a for a, _ in rows) and back.sv == sum(b for _, b in rows)
