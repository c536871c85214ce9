"""Streaming near-dup ingest: cross-batch MinHash LSH admission
against a persistent band-bucket store (sequential-admission
semantics, replay idempotency)."""

import os
import time

from flo_spark.streaming.dedup_ingest import (
    fold_neardup_batch,
    neardup_ingest,
)


def _text(tag: str, n: int = 40) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def _near(text: str) -> str:
    ws = text.split()
    ws[-1] = ws[-1] + "x"  # one word of ~40 changed: jaccard ~0.93
    return " ".join(ws)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_neardup_ingest_cross_batch_sequential_admission(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    t1, t2, t3, t4 = (_text(t) for t in ("alpha", "beta", "gamma", "delta"))
    _write(spark, str(src / "b1"), [(1, t1), (2, t2)])
    time.sleep(1.1)  # file source orders batches by mtime
    _write(
        spark,
        str(src / "b2"),
        [
            (3, _near(t1)),  # near-copy of accepted doc 1 -> rejected
            (4, t3),         # novel -> accepted
            (5, t3),         # exact in-batch copy of doc 4 -> rejected
            (6, t4),         # novel -> accepted
        ],
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    store = str(tmp_path / "store")
    accepted = neardup_ingest(
        stream, store, str(tmp_path / "ckpt"), fan_out=False
    )
    assert {r.doc_id for r in accepted.collect()} == {1, 2, 4, 6}


def test_neardup_ingest_replay_is_idempotent(spark, tmp_path):
    t1, t2 = _text("one"), _text("two")
    store = str(tmp_path / "store")
    b0 = spark.createDataFrame([(1, t1)], "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(2, _near(t1)), (3, t2)], "doc_id long, text string"
    )
    fold_neardup_batch(b0, 0, store, fan_out=False)
    fold_neardup_batch(b1, 1, store, fan_out=False)
    before = sorted(
        r.doc_id for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    )
    assert before == [1, 3]  # doc 2 is a near-copy of accepted doc 1
    # crash replay of batch 1: same data, same id -> same store
    fold_neardup_batch(b1, 1, store, fan_out=False)
    after = sorted(
        r.doc_id for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    )
    assert after == before
    assert sorted(os.listdir(store)) == ["batch=0", "batch=1"]


def test_neardup_admits_doc_colliding_only_with_rejected_doc(spark, tmp_path):
    """The sequential-admission subtlety: a doc colliding ONLY with a
    REJECTED doc must be admitted (the rejected doc never joined the
    accepted set).  Doc 2 is an exact copy of accepted doc 1 ->
    rejected; doc 3 arrives later colliding with nothing accepted."""
    t1, t3 = _text("base"), _text("fresh")
    store = str(tmp_path / "store")
    b0 = spark.createDataFrame([(1, t1)], "doc_id long, text string")
    b1 = spark.createDataFrame([(2, t1)], "doc_id long, text string")
    b2 = spark.createDataFrame([(3, t3)], "doc_id long, text string")
    fold_neardup_batch(b0, 0, store, fan_out=False)
    fold_neardup_batch(b1, 1, store, fan_out=False)
    fold_neardup_batch(b2, 2, store, fan_out=False)
    got = sorted(
        r.doc_id for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    )
    assert got == [1, 3]


def test_neardup_store_compaction_preserves_admission(spark, tmp_path):
    """compact_store is schema-agnostic (distinct over all columns),
    so the band-bucket store compacts with the same offline tool as
    the exact-dedup store — and admission decisions after compaction
    are identical: a near-copy of a pre-compaction accept still
    rejects, a novel doc still admits."""
    from flo_spark.streaming.dedup_ingest import compact_store

    t1, t2 = _text("pre"), _text("post")
    store = str(tmp_path / "store")
    fold_neardup_batch(
        spark.createDataFrame([(1, t1)], "doc_id long, text string"),
        0, store, fan_out=False,
    )
    n = compact_store(spark, store)
    assert n > 0
    assert sorted(os.listdir(store)) == ["batch=-1"]
    fold_neardup_batch(
        spark.createDataFrame(
            [(2, _near(t1)), (3, t2)], "doc_id long, text string"
        ),
        7, store, fan_out=False,
    )
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(store).select("doc_id").distinct().collect()
    )
    assert got == [1, 3]
