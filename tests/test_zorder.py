"""Z-order layout (flo_spark/operators/zorder.py): Morton key
round-trip properties and the actual file-skipping payoff, measured
from real parquet footer statistics."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flo_spark.operators.zorder import (
    write_zordered,
    zorder_value,
    zorder_value_sql,
)


def test_morton_key_interleaves_exactly():
    """Known bit patterns: dims quantized to themselves (lo=0,
    hi=2^bits-1 makes quantization the identity), interleave matches
    the hand-computed Morton code."""
    import duckdb

    bits = 4
    # x=0b1010, y=0b0110 -> interleaved (x bit i -> 2i, y bit i -> 2i+1)
    x, y = 0b1010, 0b0110
    want = 0
    for i in range(bits):
        want |= ((x >> i) & 1) << (2 * i)
        want |= ((y >> i) & 1) << (2 * i + 1)
    sql = zorder_value_sql(
        [(str(x), 0.0, float(2**bits - 1)), (str(y), 0.0, float(2**bits - 1))],
        bits=bits,
    )
    got = duckdb.connect().execute(f"SELECT {sql}").fetchone()[0]
    assert got == want


def test_spark_and_sql_keys_agree_on_random_values(spark):
    import duckdb

    df = spark.range(500).select(
        F.col("id"),
        (F.xxhash64("id") % 1000 + 1000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 5000 + 5000).alias("b"),
    )
    z = zorder_value([(F.col("a"), 0.0, 2000.0), (F.col("b"), 0.0, 10000.0)])
    got = {r["id"]: r["z"] for r in df.select("id", z.alias("z")).collect()}
    rows = df.collect()
    con = duckdb.connect()
    sql = zorder_value_sql([("a", 0.0, 2000.0), ("b", 0.0, 10000.0)])
    for r in rows[:50]:
        want = con.execute(
            f"SELECT {sql} FROM (SELECT {r['a']} AS a, {r['b']} AS b)"
        ).fetchone()[0]
        assert got[r["id"]] == want, r


def _files_overlapping(path, col, lo, hi):
    """Files whose footer [min, max] for col overlaps [lo, hi]."""
    hit, total = 0, 0
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {col} in {fname}"
        if not (fmax < lo or fmin > hi):
            hit += 1
    return hit, total


def test_zorder_layout_prunes_on_the_second_dimension(spark, tmp_path):
    """The payoff claim, measured on real footers: under a
    custkey-sorted layout a totalprice range predicate overlaps EVERY
    file (each file spans the full price range), while under the
    Z-order layout most files' price ranges exclude it — multi-column
    skipping from one layout."""
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    linear = str(tmp_path / "linear")
    (
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(
        orders,
        zpath,
        [
            (F.col("o_custkey"), 0.0, 100000.0),
            (F.col("o_totalprice"), 0.0, 600000.0),
        ],
        n_files=8,
    )
    lo, hi = 1000.0, 20000.0  # ~3% of the price domain
    lin_hit, lin_total = _files_overlapping(linear, "o_totalprice", lo, hi)
    z_hit, z_total = _files_overlapping(zpath, "o_totalprice", lo, hi)
    assert lin_total == 8 and z_total == 8
    assert lin_hit == 8, "custkey sort cannot prune a price predicate"
    assert z_hit < 8, (z_hit, "z-order must exclude some files")
    # and the layout loses no rows
    assert (
        spark.read.parquet(zpath).count()
        == orders.count()
        == spark.read.parquet(linear).count()
    )


def test_zorder_dimension_count_bounds():
    with pytest.raises(ValueError):
        zorder_value([])
    with pytest.raises(ValueError):
        zorder_value([(F.lit(1), 0, 1)] * 5)
