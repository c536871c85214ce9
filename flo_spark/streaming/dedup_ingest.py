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


# --------------------------------------------------------------------------
# Streaming NEAR-duplicate ingest (MinHash LSH against a persistent store)
# --------------------------------------------------------------------------


def _neardup_shard(store_dir: str, batch_id: int) -> str:
    return os.path.join(store_dir, f"batch={batch_id}")


def fold_neardup_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    bands: int = 16,
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
    fan_out: bool = True,
) -> None:
    """foreachBatch body: admit the batch's documents that are NOT
    near-duplicates of any previously accepted document, exactly once
    across crash replays.

    Semantics are SEQUENTIAL ADMISSION — each document (in doc-id
    order, batches in arrival order) is accepted iff none of its LSH
    band buckets collides with an already-ACCEPTED document.  A
    document that collides only with a REJECTED one is admitted (the
    rejected doc never entered the accepted set), which a naive
    "drop both band-mates" rule gets wrong.

    Per batch: one Arrow/numpy signature stage, a (band, bucket)
    semi-join against the store (rejects), a bucket self-join among
    survivors (candidate edges), connected components, then EXACT
    sequential admission per component via applyInPandas — components
    are collision clusters, orders of magnitude smaller than the
    batch, so the per-group sequential scan is bounded while groups
    run in parallel.  Accepted docs append their band keys as the
    batch's own shard (overwrite-on-replay idempotency, identical to
    ``fold_batch``).

    100 TB shape: the store holds ``bands`` 16-byte rows per accepted
    doc — ~1/10^3 of corpus bytes; the semi-join shuffles on
    (band, bucket); at scale bucket the store by that key so each
    micro-batch reads only its colliding buckets."""
    from flo_spark.operators.dedup import band_buckets, minhash_signatures
    from flo_spark.operators.graph import connected_components

    import pandas as pd

    spark = batch.sparkSession
    rows_per_band = num_hashes // bands
    bk = band_buckets(
        minhash_signatures(
            batch, id_col, text_col, shingle_k, num_hashes, seed, fan_out=fan_out
        ),
        bands,
        rows_per_band,
    ).persist()
    bk.count()  # materialize once: 4 consumer branches below

    store = _read_store(spark, store_dir, exclude_batch=batch_id)
    if store is not None:
        rejected = (
            bk.join(store, ["band", "bucket"], "left_semi")
            .select("__id")
            .distinct()
        )
        # genuinely new frame -> its own materialization; when the store
        # is empty, surv IS bk, which is already persisted and counted
        surv = bk.join(rejected, "__id", "left_anti").persist()
        surv.count()
    else:
        surv = bk

    left, right = surv.alias("l"), surv.alias("r")
    edges = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("src"), F.col("r.__id").alias("dst"))
        .distinct()
    )
    comp = connected_components(edges)
    keyed = (
        surv.join(comp, surv["__id"] == comp["node"], "left")
        .select(
            "__id",
            "band",
            "bucket",
            F.coalesce(F.col("label"), F.col("__id")).alias("comp"),
        )
    )

    def _admit(pdf: pd.DataFrame) -> pd.DataFrame:
        # one linear pass in id order (groupby(sort=True)): a single
        # giant collision cluster must not turn admission quadratic
        taken: set = set()
        keep = []
        for did, rows in pdf.groupby("__id", sort=True):
            keys = set(zip(rows["band"], rows["bucket"]))
            if keys & taken:
                continue  # collides with an earlier ACCEPTED doc
            taken |= keys
            keep.append(did)
        return pdf[pdf["__id"].isin(keep)][["__id", "band", "bucket"]]

    accepted = (
        keyed.groupBy("comp")
        .applyInPandas(_admit, "__id long, band int, bucket bigint")
        .select(F.col("__id").alias("doc_id"), "band", "bucket")
    )
    accepted.write.mode("overwrite").parquet(_neardup_shard(store_dir, batch_id))
    if surv is not bk:
        surv.unpersist()
    bk.unpersist()


def neardup_ingest(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    timeout_sec: int = 180,
    **kwargs,
) -> DataFrame:
    """Drain a document stream through the cross-batch near-dup fold
    and return the accepted doc ids (one row per admitted document)."""
    q = (
        stream.writeStream.foreachBatch(
            lambda b, eid: fold_neardup_batch(
                b, eid, store_dir, id_col, text_col, **kwargs
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"near-dup ingest did not drain within {timeout_sec}s"
        )
    spark = stream.sparkSession
    out = _read_store(spark, store_dir)
    if out is None:
        return spark.createDataFrame([], "doc_id long")
    return out.select("doc_id").distinct()
