"""Streaming sketch monitor: cross-batch accumulation, replay
idempotency, and windowed re-aggregation from shards."""

import numpy as np
from pyspark.sql import functions as F

from flo_spark.streaming.sketch_monitor import (
    fold_sketch_batch,
    read_sketch,
)


def _batch(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "value double")


def test_fold_accumulates_and_replay_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    b0 = list(range(0, 100))
    b1 = list(range(100, 300))
    fold_sketch_batch(_batch(spark, b0), 0, store, F.col("value"), capacity=64)
    fold_sketch_batch(_batch(spark, b1), 1, store, F.col("value"), capacity=64)
    sk = read_sketch(spark, store, capacity=64)
    assert sk.total_weight() == 300
    exact = np.percentile(np.arange(300), 50)
    assert abs(sk.quantile(0.5) - exact) <= sk.rank_error_bound + 3
    # crash replay of batch 1: same shard id -> same store, same weight
    fold_sketch_batch(_batch(spark, b1), 1, store, F.col("value"), capacity=64)
    sk2 = read_sketch(spark, store, capacity=64)
    assert sk2.total_weight() == 300
    assert sk2.to_row() == sk.to_row()


def test_windowed_reaggregation_from_single_shard(spark, tmp_path):
    """Any subset of history re-aggregates by merging just its shards
    — here, querying one batch's shard alone gives that batch's exact
    count, without the other batch's data."""
    store = str(tmp_path / "store")
    fold_sketch_batch(_batch(spark, range(50)), 0, store, F.col("value"))
    fold_sketch_batch(_batch(spark, range(70)), 1, store, F.col("value"))
    import os

    from flo_spark.operators.sketch import QuantileSketch

    row = spark.read.parquet(os.path.join(store, "batch=1")).collect()[0]
    sk = QuantileSketch.from_row(
        [list(lv) for lv in row.levels], int(row.bound)
    )
    assert sk.total_weight() == 70
