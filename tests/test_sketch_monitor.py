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


def test_theta_fold_state_equals_direct_and_replay_safe(spark, tmp_path):
    """Theta state is a pure function of the item set, so the folded
    store must equal a direct one-shot sketch EXACTLY — and a replayed
    batch must change nothing."""
    from flo_spark.operators.sketch import ThetaSketch
    from flo_spark.streaming.sketch_monitor import (
        fold_theta_batch,
        read_theta,
    )

    store = str(tmp_path / "store")

    def batch(rows):
        return spark.createDataFrame(rows, "seg string, item long")

    b0 = [("a", i) for i in range(50)] + [("b", i) for i in range(30)]
    b1 = [("a", i) for i in range(25, 75)] + [("b", 99)]
    fold_theta_batch(batch(b0), 0, store, F.col("seg"), F.col("item"))
    fold_theta_batch(batch(b1), 1, store, F.col("seg"), F.col("item"))
    got = read_theta(spark, store)
    direct_a = ThetaSketch(256).add(list(range(75)))
    assert got["a"].to_row() == direct_a.to_row()
    assert got["a"].estimate() == 75  # under capacity: exact
    assert got["b"].estimate() == 31
    # overlap straight from the store, no raw data
    assert got["a"].intersect_estimate(got["b"]) == 31 - 1
    fold_theta_batch(batch(b1), 1, store, F.col("seg"), F.col("item"))
    again = read_theta(spark, store)
    assert again["a"].to_row() == got["a"].to_row()


def test_quantile_store_compaction_preserves_answers(spark, tmp_path):
    from flo_spark.streaming.sketch_monitor import compact_sketch_store

    store = str(tmp_path / "store")
    fold_sketch_batch(_batch(spark, range(100)), 0, store, F.col("value"))
    fold_sketch_batch(_batch(spark, range(100, 300)), 1, store, F.col("value"))
    fold_sketch_batch(_batch(spark, range(300, 350)), 2, store, F.col("value"))
    before = read_sketch(spark, store)
    folded = compact_sketch_store(spark, store, committed_through=2)
    assert folded == 3
    import os

    assert not [
        d for d in os.listdir(store) if d.startswith("batch=")
    ]
    after = read_sketch(spark, store)
    assert after.total_weight() == before.total_weight() == 350
    for q in (0.1, 0.5, 0.9):
        assert after.quantile(q) == before.quantile(q)
    # keeps accepting new batches on top of the base
    fold_sketch_batch(_batch(spark, range(350, 400)), 3, store, F.col("value"))
    assert read_sketch(spark, store).total_weight() == 400


def test_theta_store_compaction_state_equal(spark, tmp_path):
    from flo_spark.operators.sketch import ThetaSketch
    from flo_spark.streaming.sketch_monitor import (
        compact_theta_store,
        fold_theta_batch,
        read_theta,
    )

    store = str(tmp_path / "store")

    def batch(rows):
        return spark.createDataFrame(rows, "seg string, item long")

    fold_theta_batch(
        batch([("a", i) for i in range(60)]), 0, store,
        F.col("seg"), F.col("item"),
    )
    fold_theta_batch(
        batch([("a", i) for i in range(30, 90)] + [("b", 1)]), 1, store,
        F.col("seg"), F.col("item"),
    )
    before = read_theta(spark, store)
    folded = compact_theta_store(spark, store, committed_through=1)
    assert folded == 2
    after = read_theta(spark, store)
    assert set(after) == {"a", "b"}
    # theta state is a pure set function: compacted == uncompacted
    assert after["a"].to_row() == before["a"].to_row()
    assert after["a"].to_row() == ThetaSketch(256).add(range(90)).to_row()
    # default guard (no watermark) folds nothing when one live batch
    fold_theta_batch(
        batch([("b", 2)]), 2, store, F.col("seg"), F.col("item")
    )
    assert compact_theta_store(spark, store) == 0
    assert read_theta(spark, store)["b"].estimate() == 2
