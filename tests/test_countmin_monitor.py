"""Count-Min sliding monitor: slide expansion, cross-batch exactness,
replay idempotency, and folded-store == direct-sketch state."""

from datetime import datetime, timedelta

import numpy as np
from pyspark.sql import functions as F

from flo_spark.operators.sketch import CountMinSketch
from flo_spark.streaming.sketch_monitor import (
    fold_countmin_batch,
    read_candidate_counts,
    read_countmin_windows,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, user_id long")


def test_slide_expansion_and_cross_batch_counts(spark, tmp_path):
    store = str(tmp_path / "store")
    # 00:10 belongs to windows starting 23:30 (prev day) and 00:00
    b0 = [(T0 + timedelta(minutes=10), 1), (T0 + timedelta(minutes=40), 1)]
    b1 = [(T0 + timedelta(minutes=50), 1), (T0 + timedelta(minutes=50), 2)]
    fold_countmin_batch(
        _batch(spark, b0), 0, store, F.col("ts"), F.col("user_id"),
        width=64, depth=2,
    )
    fold_countmin_batch(
        _batch(spark, b1), 1, store, F.col("ts"), F.col("user_id"),
        width=64, depth=2,
    )
    counts = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }
    # window 00:00-01:00 sees user 1 three times (00:10, 00:40, 00:50)
    assert counts[(T0, 1)] == 3
    assert counts[(T0, 2)] == 1
    # window 00:30-01:30 sees 00:40 and both 00:50 events
    assert counts[(T0 + timedelta(minutes=30), 1)] == 2
    # the 00:10 event's earlier window starts the previous day 23:30
    assert counts[(T0 - timedelta(minutes=30), 1)] == 1
    # every event lands in exactly window/slide = 2 windows
    assert sum(counts.values()) == 2 * (len(b0) + len(b1))


def test_replay_is_idempotent_and_store_equals_direct(spark, tmp_path):
    store = str(tmp_path / "store")
    rng = np.random.default_rng(3)
    rows0 = [
        (T0 + timedelta(minutes=int(m)), int(u))
        for m, u in zip(rng.integers(0, 120, 40), rng.integers(0, 5, 40))
    ]
    rows1 = [
        (T0 + timedelta(minutes=int(m)), int(u))
        for m, u in zip(rng.integers(60, 180, 40), rng.integers(0, 5, 40))
    ]
    kw = dict(width=64, depth=2)
    fold_countmin_batch(
        _batch(spark, rows0), 0, store, F.col("ts"), F.col("user_id"), **kw
    )
    fold_countmin_batch(
        _batch(spark, rows1), 1, store, F.col("ts"), F.col("user_id"), **kw
    )
    sketches = read_countmin_windows(spark, store, 64, 2)
    exact = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }
    # folded per-window sketch state == a direct one-shot sketch over
    # that window's items (CM state is a pure multiset function)
    for wstart, sk in sketches.items():
        direct = CountMinSketch(64, 2)
        items = {
            item: cnt for (w, item), cnt in exact.items() if w == wstart
        }
        direct.add(list(items), list(items.values()))
        assert np.array_equal(sk.table, direct.table), wstart
        assert sk.total == direct.total
        # one-sided invariant against the exact counts
        for item, cnt in items.items():
            assert sk.estimate(item) >= cnt
    # crash replay of batch 1: identical store afterwards
    fold_countmin_batch(
        _batch(spark, rows1), 1, store, F.col("ts"), F.col("user_id"), **kw
    )
    again = read_countmin_windows(spark, store, 64, 2)
    assert set(again) == set(sketches)
    for wstart in sketches:
        assert np.array_equal(again[wstart].table, sketches[wstart].table)
    exact_again = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }
    assert exact_again == exact


def test_compaction_preserves_state_and_accepts_new_batches(spark, tmp_path):
    store = str(tmp_path / "store")
    rng = np.random.default_rng(7)

    def rows(seed_shift, lo, hi):
        return [
            (T0 + timedelta(minutes=int(m)), int(u))
            for m, u in zip(
                rng.integers(lo, hi, 30), rng.integers(0, 6, 30)
            )
        ]

    kw = dict(width=64, depth=2)
    fold_countmin_batch(
        _batch(spark, rows(0, 0, 90)), 0, store,
        F.col("ts"), F.col("user_id"), **kw,
    )
    fold_countmin_batch(
        _batch(spark, rows(1, 60, 150)), 1, store,
        F.col("ts"), F.col("user_id"), **kw,
    )
    before_sk = read_countmin_windows(spark, store, 64, 2)
    before_cnt = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }

    from flo_spark.streaming.sketch_monitor import compact_countmin_store

    # the default guard treats the HIGHEST batch id as possibly
    # uncommitted (foreachBatch writes before the checkpoint commits)
    # and folds everything below it
    folded = compact_countmin_store(spark, store, 64, 2)
    assert folded == 2  # batch 0 only, x two kinds
    mid_cnt = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }
    assert mid_cnt == before_cnt  # batch 1 still live alongside the base
    # with a known committed watermark, everything folds
    folded = compact_countmin_store(spark, store, 64, 2, committed_through=1)
    assert folded == 2  # batch 1 in each kind
    import os

    assert not [
        d for d in os.listdir(f"{store}/sketch") if d.startswith("batch=")
    ]
    assert any(
        d.startswith("base-upto-1") for d in os.listdir(f"{store}/sketch")
    )
    after_sk = read_countmin_windows(spark, store, 64, 2)
    after_cnt = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }
    assert after_cnt == before_cnt
    assert set(after_sk) == set(before_sk)
    for w in before_sk:
        assert np.array_equal(after_sk[w].table, before_sk[w].table)
        assert after_sk[w].total == before_sk[w].total

    # new batches keep folding on top of the compacted base
    fold_countmin_batch(
        _batch(spark, rows(2, 120, 200)), 2, store,
        F.col("ts"), F.col("user_id"), **kw,
    )
    final_cnt = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }
    assert sum(final_cnt.values()) == sum(before_cnt.values()) + 2 * 30
    # idempotent: compacting twice in a row changes nothing
    compact_countmin_store(spark, store, 64, 2)
    again = compact_countmin_store(spark, store, 64, 2)
    assert again == 0  # no batch shards left to fold
    final2 = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }
    assert final2 == final_cnt


def test_stale_shards_below_watermark_are_ignored_and_swept(spark, tmp_path):
    """Crash window: a compaction published base-upto-N but died before
    cleanup — batch shards <= N still on disk must NOT double-count,
    and the next compaction sweeps them."""
    import os

    from flo_spark.streaming.sketch_monitor import compact_countmin_store

    store = str(tmp_path / "store")
    rows = [(T0 + timedelta(minutes=m), u) for m, u in
            [(5, 1), (10, 1), (20, 2)]]
    kw = dict(width=64, depth=2)
    fold_countmin_batch(
        _batch(spark, rows), 0, store, F.col("ts"), F.col("user_id"), **kw
    )
    fold_countmin_batch(
        _batch(spark, rows), 1, store, F.col("ts"), F.col("user_id"), **kw
    )
    truth = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }
    compact_countmin_store(spark, store, 64, 2, committed_through=1)
    # simulate the crash leftover: re-create a batch shard BELOW the
    # base watermark (exactly what an interrupted cleanup leaves)
    fold_countmin_batch(
        _batch(spark, rows), 1, store, F.col("ts"), F.col("user_id"), **kw
    )
    assert any(
        d.startswith("batch=") for d in os.listdir(f"{store}/cand")
    )
    stale_view = {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    }
    assert stale_view == truth  # ignored, not double-counted
    sk = read_countmin_windows(spark, store, 64, 2)
    for (w, item), cnt in truth.items():
        assert sk[w].estimate(int(item)) >= cnt
    compact_countmin_store(spark, store, 64, 2, committed_through=1)
    assert not any(
        d.startswith("batch=") for d in os.listdir(f"{store}/cand")
    )
    assert {
        (r.window_start, r.item): r.cnt
        for r in read_candidate_counts(spark, store).collect()
    } == truth
