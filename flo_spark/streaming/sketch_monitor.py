"""Streaming quantile monitoring over a persistent sketch store.

The payoff of a MERGEABLE sketch (operators/sketch.py): each
micro-batch reduces to one O(capacity * log n) sketch row, persisted
as the batch's own parquet shard — so the monitoring state survives
restarts, replayed batches overwrite their own shard instead of
double-counting (the flo-writer/dedup-ingest idempotency recipe), and
ANY window of history re-aggregates by merging its shards without
rescanning raw data.  ``percentile_approx`` cannot do this: its sketch
state never leaves the query that built it.

100 TB shape: the per-batch reduction is one Arrow pass over the
batch's partitions plus a single-task merge; the store grows by one
tiny row per batch (compactable by merging shards); querying merges
O(batches) sketches, never touching the stream's raw history.
"""

from __future__ import annotations

import os
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flo_spark.operators.sketch import (
    SKETCH_ROW_SCHEMA as _SCHEMA,
)
from flo_spark.operators.sketch import QuantileSketch


def _shard(store_dir: str, batch_id: int) -> str:
    return os.path.join(store_dir, f"batch={batch_id}")


def fold_sketch_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    value: Column,
    capacity: int = 1024,
) -> None:
    """foreachBatch body: reduce the batch to one sketch row, written
    exactly once across crash replays (overwrite-own-shard)."""
    import pandas as pd

    from flo_spark.operators.sketch import (
        merge_sketch_rows,
        sketch_partials_fn,
    )

    def merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        levels, bound = merge_sketch_rows(pdf, capacity).to_row()
        return pd.DataFrame({"levels": [levels], "bound": [bound]})

    parts = batch.select(value.alias("v")).mapInPandas(
        sketch_partials_fn(capacity), _SCHEMA
    )
    merged = (
        parts.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(merge_rows, _SCHEMA)
    )
    merged.write.mode("overwrite").parquet(_shard(store_dir, batch_id))


def read_sketch(spark, store_dir: str, capacity: int = 1024) -> QuantileSketch:
    """Merge every persisted batch shard into one queryable sketch.
    Driver-side, but O(batches) tiny rows — documented, never raw data."""
    sk = QuantileSketch(capacity)
    if not os.path.isdir(store_dir):
        return sk
    shards = [
        os.path.join(store_dir, d)
        for d in os.listdir(store_dir)
        if d.startswith("batch=")
    ]
    if not shards:
        return sk
    for row in spark.read.parquet(*shards).collect():
        sk.merge(
            QuantileSketch.from_row(
                [list(lv) for lv in row.levels], int(row.bound), capacity
            )
        )
    return sk


def sketch_monitor(
    stream: DataFrame,
    store_dir: str,
    value: Column,
    checkpoint_dir: str,
    capacity: int = 1024,
    timeout_sec: int = 120,
) -> QuantileSketch:
    """Drain a stream through the sketch fold; return the merged
    all-time sketch."""
    q = (
        stream.writeStream.foreachBatch(
            lambda b, eid: fold_sketch_batch(b, eid, store_dir, value, capacity)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"sketch monitor did not drain within {timeout_sec}s")
    return read_sketch(stream.sparkSession, store_dir, capacity)


# -------------------------------------------------------------------------
# Theta-sketch audience monitor: per-segment distinct sets, streamed
# -------------------------------------------------------------------------

_THETA_SCHEMA = "segment string, hashes array<long>"


def fold_theta_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    segment: Column,
    item: Column,
    k: int = 256,
) -> None:
    """foreachBatch body: one theta sketch row per segment value,
    written as the batch's own replay-safe shard.  Because theta
    state is a pure function of the item SET, shards from replayed or
    reordered batches merge to the identical store."""
    import pandas as pd

    from flo_spark.operators.sketch import ThetaSketch

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = ThetaSketch(k).add(pdf["item"].tolist())
        return pd.DataFrame(
            {"segment": [pdf["segment"].iloc[0]], "hashes": [sk.to_row()]}
        )

    rows = (
        batch.select(segment.alias("segment"), item.alias("item"))
        .groupBy("segment")
        .applyInPandas(build, _THETA_SCHEMA)
    )
    rows.write.mode("overwrite").parquet(_shard(store_dir, batch_id))


def read_theta(spark, store_dir: str, k: int = 256):
    """{segment: merged ThetaSketch} across every batch shard —
    O(batches x segments) tiny rows, never the raw items."""
    from flo_spark.operators.sketch import ThetaSketch

    out: dict = {}
    if not os.path.isdir(store_dir):
        return out
    shards = [
        os.path.join(store_dir, d)
        for d in os.listdir(store_dir)
        if d.startswith("batch=")
    ]
    if not shards:
        return out
    for row in spark.read.parquet(*shards).collect():
        sk = out.setdefault(row.segment, ThetaSketch(k))
        sk.merge(ThetaSketch.from_row(list(row.hashes), k))
    return out


def theta_monitor(
    stream: DataFrame,
    store_dir: str,
    segment: Column,
    item: Column,
    checkpoint_dir: str,
    k: int = 256,
    timeout_sec: int = 120,
):
    """Drain a stream through the theta fold; return the merged
    per-segment sketches (distinct counts AND pairwise overlaps
    queryable forever without rescanning history)."""
    q = (
        stream.writeStream.foreachBatch(
            lambda b, eid: fold_theta_batch(
                b, eid, store_dir, segment, item, k
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"theta monitor did not drain within {timeout_sec}s")
    return read_theta(stream.sparkSession, store_dir, k)
