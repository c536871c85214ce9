"""Property: load() yields IDENTICAL events regardless of how the
producer encoded the timestamp column.

The driver's testdata has already shipped two encodings across rounds
(TIMESTAMP(NANOS), then TIMESTAMP_MICROS/isAdjustedToUTC=0); this
writes the same rows in every shape Spark can meet — nanos (read as
long under nanosAsLong), micros-naive (read as TIMESTAMP_NTZ), and
micros-UTC (read as TIMESTAMP) — and asserts the loader's normalized
output is byte-identical, including the min_ts pushdown path.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE_US = [
    1717200000_000_000,  # 2024-06-01 00:00:00 UTC
    1717203661_500_000,  # +1h1m1.5s (sub-second survives every unit)
    1722470399_999_999,  # 2024-07-31 23:59:59.999999
    1735689600_000_000,  # 2025-01-01 00:00:00
]


def _write_variants(tmpdir):
    cols = {
        "event_id": pa.array(range(len(BASE_US)), pa.int64()),
        "user_id": pa.array([7] * len(BASE_US), pa.int64()),
        "event_type": pa.array(["click"] * len(BASE_US)),
        "value": pa.array([1.5] * len(BASE_US), pa.float64()),
        "props": pa.array(['{"k":1}'] * len(BASE_US)),
    }
    variants = {
        "nanos": pa.array([us * 1000 for us in BASE_US], pa.timestamp("ns")),
        "micros_naive": pa.array(BASE_US, pa.timestamp("us")),
        "micros_utc": pa.array(BASE_US, pa.timestamp("us", tz="UTC")),
    }
    paths = {}
    for name, ts in variants.items():
        d = os.path.join(tmpdir, name)
        os.makedirs(d, exist_ok=True)
        table = pa.table({"event_id": cols["event_id"], "ts": ts, **{
            k: v for k, v in cols.items() if k != "event_id"
        }})
        pq.write_table(table, os.path.join(d, "events.parquet"))
        paths[name] = d
    return paths


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    return _write_variants(str(tmp_path_factory.mktemp("ts_enc")))


def _collect(spark, sf_dir, min_ts=None):
    from flo_spark.queries import load

    df = load(spark, sf_dir, "events", min_ts=min_ts)
    assert dict(df.dtypes)["ts"] == "timestamp", dict(df.dtypes)
    return sorted(
        (r["event_id"], r["ts"].isoformat()) for r in df.select("event_id", "ts").collect()
    )


def test_all_encodings_normalize_identically(spark, variant_dirs):
    results = {n: _collect(spark, d) for n, d in variant_dirs.items()}
    ref = results["micros_utc"]
    assert len(ref) == len(BASE_US)
    for name, got in results.items():
        assert got == ref, f"{name} diverged: {got} != {ref}"


def test_min_ts_filters_identically_across_encodings(spark, variant_dirs):
    cutoff = "2024-07-01 00:00:00"
    results = {n: _collect(spark, d, min_ts=cutoff) for n, d in variant_dirs.items()}
    ref = results["micros_utc"]
    assert len(ref) == 2  # the two events after July 2024
    for name, got in results.items():
        assert got == ref, f"{name} diverged under min_ts: {got} != {ref}"
