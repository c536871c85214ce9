"""Operational monitoring tour — the restart-safe sketch stores:

    stream a metric -> per-batch QUANTILE sketch shards (all-time
    p50/p95 without rescans) -> per-segment THETA sketches (distinct
    counts AND audience overlaps) -> sliding COUNT-MIN heavy hitters
    per window -> compact the store and keep answering.

Every monitor folds each micro-batch into tiny mergeable sketch rows
persisted as replay-safe shards; queries merge shards, never raw
history, and a crash-replayed batch overwrites its own shard instead
of double-counting.

Usage:
    python examples/ops_monitoring.py [WORKDIR]
"""

import os
import sys
import tempfile
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir: str) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    import flo_spark as fs
    from flo_spark.streaming.sketch_monitor import (
        compact_countmin_store,
        fold_countmin_batch,
        fold_sketch_batch,
        fold_theta_batch,
        read_candidate_counts,
        read_countmin_windows,
        read_sketch,
        read_theta,
    )

    spark = fs.get_spark("ops-monitoring-tour")
    t0 = datetime(2024, 1, 1)
    rng = np.random.default_rng(42)

    def metric_batch(n, seed_shift):
        rows = [
            (
                t0 + timedelta(minutes=int(m)),
                int(u),
                ["view", "click", "purchase"][int(e)],
                float(v),
            )
            for m, u, e, v in zip(
                rng.integers(0, 240, n),
                rng.integers(0, 50, n),
                rng.integers(0, 3, n),
                rng.gamma(2.0, 40.0, n),
            )
        ]
        return spark.createDataFrame(
            rows, "ts timestamp, user_id long, event_type string, value double"
        )

    # --- 1. quantile monitor: all-time latency percentiles ------------
    qstore = os.path.join(workdir, "quantiles")
    for batch_id in range(3):
        fold_sketch_batch(
            metric_batch(2000, batch_id), batch_id, qstore, F.col("value")
        )
    sk = read_sketch(spark, qstore)
    print(
        f"quantiles over {sk.total_weight()} values from 3 shards: "
        f"p50={sk.quantile(0.5):.1f} p95={sk.quantile(0.95):.1f} "
        f"(rank error bound {sk.rank_error_bound})"
    )

    # --- 2. theta monitor: distinct users AND overlaps ----------------
    tstore = os.path.join(workdir, "theta")
    for batch_id in range(3):
        fold_theta_batch(
            metric_batch(2000, batch_id), batch_id, tstore,
            F.col("event_type"), F.col("user_id"),
        )
    sketches = read_theta(spark, tstore)
    view, click = sketches["view"], sketches["click"]
    print(
        f"distinct viewers ~{view.estimate():.0f}, clickers "
        f"~{click.estimate():.0f}, did-both "
        f"~{view.intersect_estimate(click):.0f} — all from sketch rows, "
        "no distinct-join"
    )

    # --- 3. sliding Count-Min heavy hitters + compaction ---------------
    cstore = os.path.join(workdir, "countmin")
    for batch_id in range(3):
        fold_countmin_batch(
            metric_batch(2000, batch_id), batch_id, cstore,
            F.col("ts"), F.col("user_id"),
        )
    top = (
        read_candidate_counts(spark, cstore)
        .orderBy(F.col("cnt").desc(), "window_start", "item")
        .limit(3)
        .collect()
    )
    windows = read_countmin_windows(spark, cstore)
    for r in top:
        est = windows[r.window_start].estimate(int(r.item))
        print(
            f"window {r.window_start:%H:%M}: user {r.item} x{r.cnt} "
            f"(sketch estimate {est} >= exact: {est >= r.cnt})"
        )
    folded = compact_countmin_store(spark, cstore, committed_through=2)
    after = read_candidate_counts(spark, cstore).count()
    print(
        f"compacted {folded} batch shards into base-upto-2; "
        f"{after} (window,user) counts still answerable"
    )

    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(sys.argv[1])
    else:
        with tempfile.TemporaryDirectory(prefix="flo_ops_tour_") as d:
            main(d)
