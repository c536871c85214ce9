"""Streaming ingestion with UNBOUNDED cross-batch exact dedup.

``streaming_dedup`` (consume_stream.py) is the watermarked form: state
is bounded by the watermark, so a duplicate arriving after the horizon
is re-admitted.  Training-corpus ingestion needs the opposite
contract — a document seen ONCE is a duplicate FOREVER — which no
watermark can express.  This operator keeps the seen-set in a
persistent parquet store instead of the state store:

- per micro-batch: distinct new keys = batch keys ANTI-JOIN store;
- accepted keys append as a shard named by the batch id, so a batch
  REPLAYED after a crash overwrites its own shard instead of
  double-inserting (the same idempotency recipe as the flo writer's
  commit ledger) — the replay excludes its own shard from the
  anti-join side, or previously-written rows would mask themselves;
- the store is append-only: each batch writes ONLY its new keys
  (never rewrites history), so a year of ingest costs a year of
  small shards, compactable offline.

100 TB shape: the anti-join shuffles on the hash key; the store side
is the big one, so at scale keep it bucketed by key so only the
batch's buckets are read (bucket pruning), or broadcast the BATCH's
distinct keys when the batch is small — both shapes preserve the
semantic.  The store holds only fixed-width keys (16-byte digests),
~1/10^4 of corpus bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _batch_dir(store_dir: str, batch_id: int) -> str:
    return os.path.join(store_dir, f"batch={batch_id}")


def _read_store(spark, store_dir: str, exclude_batch: int | None = None):
    """All accepted keys, optionally excluding one batch's shard (the
    replay case).  Returns None when the store is empty."""
    if not os.path.isdir(store_dir):
        return None
    shards = [
        os.path.join(store_dir, d)
        for d in os.listdir(store_dir)
        if d.startswith("batch=")
        and (exclude_batch is None or d != f"batch={exclude_batch}")
    ]
    if not shards:
        return None
    return spark.read.parquet(*shards)


def fold_batch(
    batch: DataFrame, batch_id: int, store_dir: str, key: Column
) -> None:
    """foreachBatch body: accept the batch's first-seen keys into the
    store, exactly once across crash replays."""
    spark = batch.sparkSession
    keys = batch.select(key.alias("dedup_key")).distinct()
    store = _read_store(spark, store_dir, exclude_batch=batch_id)
    if store is not None:
        keys = keys.join(store, "dedup_key", "left_anti")
    # mode=overwrite: a replayed batch rewrites its own shard verbatim
    keys.write.mode("overwrite").parquet(_batch_dir(store_dir, batch_id))


def dedup_ingest(
    stream: DataFrame,
    store_dir: str,
    key: Column,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> DataFrame:
    """Drain a stream through the cross-batch dedup fold and return the
    accepted-key set (one row per first-seen key, all time)."""
    q = (
        stream.writeStream.foreachBatch(
            lambda b, eid: fold_batch(b, eid, store_dir, key)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"dedup ingest did not drain within {timeout_sec}s")
    spark = stream.sparkSession
    out = _read_store(spark, store_dir)
    if out is None:
        return spark.createDataFrame([], "dedup_key string")
    return out.distinct()


def accepted_keys(spark, store_dir: str) -> DataFrame:
    out = _read_store(spark, store_dir)
    if out is None:
        return spark.createDataFrame([], "dedup_key string")
    return out.distinct()


def compact_store(spark, store_dir: str) -> int:
    """Offline compaction: fold all batch shards into one, so a year
    of ingest (one small shard per micro-batch) becomes one scan-
    efficient file set.  Run only while no ingest is active (the
    shards are the replay-idempotency unit).  The compacted shard
    takes batch id -1, which no Spark epoch ever uses, so a later
    resumed ingest can never overwrite it.  Returns the key count."""
    import shutil

    keys = accepted_keys(spark, store_dir)
    n = keys.count()
    if n == 0:
        return 0
    tmp = store_dir.rstrip("/") + "__compact_tmp"
    keys.write.mode("overwrite").parquet(tmp)
    for d in os.listdir(store_dir):
        if d.startswith("batch="):
            shutil.rmtree(os.path.join(store_dir, d), ignore_errors=True)
    os.replace(tmp, _batch_dir(store_dir, -1))
    return n
