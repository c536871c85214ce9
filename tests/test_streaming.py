"""Streaming consume — tail/await semantics (embedded_tests.rs:254-291
live-tail and :149-166 stop-at-end equivalents)."""

import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flo_spark.sources.event_table import EventStream
from flo_spark.streaming.consume_stream import (
    consume_stream,
    consume_tail_ordered,
    run_to_memory,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(namespace=ns, data=bytearray(d, "utf8"), partition=p) for ns, d, p in rows]
    )


@pytest.fixture()
def stream(spark, tmp_path):
    s = EventStream.create(spark, str(tmp_path / "s"), num_partitions=2)
    s.produce(_batch(spark, [("/a/x", f"d{i}", (i % 2) + 1) for i in range(10)]))
    yield s
    s.drop()


def test_drain_mode_stops_at_end_of_stream(spark, stream):
    # await_new=False == AvailableNow: drain everything, then terminate
    sdf = consume_stream(spark, stream.path, namespace="/a/*")
    got = run_to_memory(sdf, await_new=False, timeout_sec=90).collect()
    assert len(got) == 10


def test_drain_respects_version_vector_and_glob(spark, stream):
    stream.produce(_batch(spark, [("/b/y", "zz", 1)]))
    sdf = consume_stream(
        spark, stream.path, namespace="/a/*", version_vector={1: 2, 2: 0}
    )
    got = run_to_memory(sdf, await_new=False, timeout_sec=90).collect()
    # partition 1 events with counter > 2, all of partition 2, '/a/*' only
    assert all(e.namespace == "/a/x" for e in got)
    assert all(not (e.partition == 1 and e.event_counter <= 2) for e in got)


def test_tail_mode_delivers_new_events(spark, stream):
    # await_new=True: query stays up; newly produced events arrive
    sdf = consume_stream(spark, stream.path)
    mem, query = run_to_memory(sdf, await_new=True)
    try:
        deadline = time.time() + 120
        while mem.count() < 10 and time.time() < deadline:
            time.sleep(1)
        assert mem.count() == 10
        stream.produce(_batch(spark, [("/a/new", "late", 1)]))
        while mem.count() < 11 and time.time() < deadline:
            time.sleep(1)
        assert mem.count() == 11  # tail saw the late event (A9)
    finally:
        query.stop()


def test_batch_size_credit_flow(spark, tmp_path):
    # A8: SetBatchSize analog — per-trigger delivery bounded by the
    # credit window, rounded up to whole segments
    s = EventStream.create(
        spark, str(tmp_path / "credit"), num_partitions=1, segment_max_records=5
    )
    for chunk in range(4):
        s.produce(_batch(spark, [("/c", f"d{chunk}-{i}", 1) for i in range(5)]))
    tail = consume_tail_ordered(
        spark, s.path, await_new=False, batch_size=5
    )
    batches = tail.batches()
    assert len(tail.rows()) == 20
    assert len(batches) >= 4  # one segment (5 events) per trigger
    assert all(len(b) <= 5 for b in batches)
    s.drop()


def test_tail_ordered_delivery(spark, stream):
    # embedded_tests.rs:169-200 — the live consumer receives events
    # k-way-merged by (event_counter, actor) within each delivery
    tail = consume_tail_ordered(
        spark, stream.path, await_new=False, max_files_per_trigger=1
    )
    batches = tail.batches()
    assert len(batches) >= 2  # maxFilesPerTrigger=1 forces several
    for rows in batches:
        ids = [(r.event_counter, r.actor) for r in rows]
        assert ids == sorted(ids), "micro-batch not merged in id order"
    assert len(tail.rows()) == 10


def test_tail_ordered_live_sees_new_events(spark, stream):
    tail = consume_tail_ordered(spark, stream.path, await_new=True)
    try:
        tail.process_available(timeout_sec=90)
        n0 = len(tail.rows())
        assert n0 == 10
        stream.produce(_batch(spark, [("/a/new", "late", 2)]))
        deadline = time.time() + 90
        while len(tail.rows()) < 11 and time.time() < deadline:
            time.sleep(0.5)
        rows = tail.rows()
        assert len(rows) == 11
        for batch in tail.batches():
            ids = [(r.event_counter, r.actor) for r in batch]
            assert ids == sorted(ids)
    finally:
        tail.stop()


def test_checkpoint_resume_exactly_once(spark, stream, tmp_path):
    # A3 durable cursor: a restarted consumer with the same checkpoint
    # resumes exactly after the last delivered batch — no replays, no
    # gaps (the file-source offset log is Spark's version vector)
    ckpt = str(tmp_path / "cursor")
    first = consume_tail_ordered(
        spark, stream.path, await_new=False, checkpoint_dir=ckpt
    )
    assert len(first.rows()) == 10
    stream.produce(_batch(spark, [("/a/x", "new1", 1), ("/a/x", "new2", 2)]))
    second = consume_tail_ordered(
        spark, stream.path, await_new=False, checkpoint_dir=ckpt
    )
    ids = sorted((r.event_counter, r.actor) for r in second.rows())
    assert len(ids) == 2  # ONLY the new events; first 10 not replayed
    assert all(c > 10 for c, _ in ids)
    third = consume_tail_ordered(
        spark, stream.path, await_new=False, checkpoint_dir=ckpt
    )
    assert third.rows() == []  # cursor fully caught up


def test_mid_segment_restart_no_duplicates(spark, tmp_path):
    """Event-granular resume (VERDICT r4 gap #1): the file-source
    checkpoint is segment-granular, so a consumer that crashes AFTER
    side-effecting an epoch but BEFORE its commit gets that epoch's
    segment redelivered on restart.  ``resume_trim`` (the VersionVector
    of what the first incarnation actually delivered) must trim the
    redelivered batch so the restart delivers NO duplicate events —
    flo's per-event cursor semantics (consumer_stream/mod.rs:84-119)
    recovered on Spark's at-least-once foreachBatch."""
    from flo_spark.version_vector import EventId, VersionVector

    s = EventStream.create(
        spark, str(tmp_path / "mid"), num_partitions=1, segment_max_records=5
    )
    for chunk in range(3):
        s.produce(_batch(spark, [("/m", f"d{chunk}-{i}", 1) for i in range(5)]))
    ckpt = str(tmp_path / "ckpt")

    first_delivered: list = []

    def crashing_sink(rows, epoch_id):
        first_delivered.extend(rows)
        if len(first_delivered) >= 10:
            # epoch 1 committed; THIS epoch side-effected but its commit
            # never lands => its segment will be redelivered on restart
            raise RuntimeError("simulated consumer crash mid-epoch")

    with pytest.raises(Exception, match="crash mid-epoch"):
        consume_tail_ordered(
            spark,
            s.path,
            await_new=False,
            batch_size=5,
            checkpoint_dir=ckpt,
            sink=crashing_sink,
        )
    assert len(first_delivered) == 10  # two epochs side-effected

    trim = VersionVector()
    for r in first_delivered:
        trim.update_if_greater(EventId.of(r.actor, r.event_counter))
    assert trim == VersionVector({1: 10})

    second = consume_tail_ordered(
        spark,
        s.path,
        await_new=False,
        batch_size=5,
        checkpoint_dir=ckpt,
        resume_trim=trim,
    )
    second_ids = [(r.event_counter, r.actor) for r in second.rows()]
    first_ids = [(r.event_counter, r.actor) for r in first_delivered]
    assert not set(first_ids) & set(second_ids), "restart redelivered events"
    assert sorted(first_ids + second_ids) == [(c, 1) for c in range(1, 16)]
    assert second.delivered_vv() == VersionVector({1: 15})
    s.drop()


def test_large_payload_roundtrip(spark, tmp_path):
    """1 MiB payload produce/consume — the sync_client_tests.rs:84-100
    analog: payload bytes survive the parquet round trip exactly."""
    s = EventStream.create(spark, str(tmp_path / "big"), num_partitions=1)
    big = bytes(range(256)) * 4096  # 1 MiB, deterministic
    s.produce(
        spark.createDataFrame(
            [
                Row(namespace="/big/a", data=bytearray(big), partition=1),
                Row(namespace="/big/b", data=bytearray(b"small"), partition=1),
            ]
        )
    )
    out = {e.namespace: bytes(e.data) for e in s.consume().collect()}
    assert len(out["/big/a"]) == 1_048_576
    assert out["/big/a"] == big
    assert out["/big/b"] == b"small"
    s.drop()


def test_produce_stream_foreachbatch_roundtrip(spark, tmp_path):
    """Streaming produce (foreachBatch sink): drain a file source into
    an EventStream, then batch-consume the events back with contiguous
    ids and glob-filterable namespaces."""
    from flo_spark.streaming.produce_stream import produce_stream

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        [(f"/prod/s{i % 3}", f"payload{i}") for i in range(20)],
        ["namespace", "text"],
    ).coalesce(1).write.parquet(str(src_dir / "in"))

    sink = EventStream.create(spark, str(tmp_path / "sunk"), num_partitions=2)
    src = (
        spark.readStream.schema("namespace string, text string")
        .parquet(str(src_dir / "in"))
        .withColumn("data", F.encode("text", "utf-8"))
        .drop("text")
    )
    produce_stream(sink, src, checkpoint_dir=str(tmp_path / "ckpt"))

    out = sink.consume().collect()
    assert len(out) == 20
    counters = sorted(e.event_counter for e in out)
    assert counters == list(range(1, 21))  # contiguous id range (A15)
    sub = sink.consume(namespace="/prod/s1").collect()
    assert all(e.namespace == "/prod/s1" for e in sub) and sub


def test_available_now_drain_timeout_raises(spark, tmp_path):
    """A drain that cannot finish inside timeout_sec must RAISE, not
    return as if complete (advisory: silent truncation)."""
    import time

    import pytest

    from flo_spark.sources.event_table import EventStream
    from flo_spark.streaming.produce_stream import produce_stream

    src_stream = EventStream.create(spark, str(tmp_path / "src"))
    batch = spark.createDataFrame(
        [("/t", b"x")], "namespace string, data binary"
    )
    src_stream.produce(batch)
    dst = EventStream.create(spark, str(tmp_path / "dst"))

    from flo_spark.streaming.consume_stream import consume_stream
    from flo_spark.streaming.produce_stream import _run_foreach_batch

    source = consume_stream(spark, src_stream.path)
    with pytest.raises(TimeoutError, match="did not finish"):
        _run_foreach_batch(
            source,
            lambda bdf, _eid: time.sleep(8),
            checkpoint_dir=None,
            await_completion=True,
            timeout_sec=1,
        )


def test_sink_mode_bounds_driver_memory(spark, tmp_path):
    """With a sink callback attached, the TailConsumer must NOT retain
    delivered batches (a long-running tail would otherwise accumulate
    every micro-batch in driver memory forever).  The delivered_vv()
    cursor stays exact — it is folded incrementally at delivery."""
    from flo_spark.version_vector import VersionVector

    s = EventStream.create(
        spark, str(tmp_path / "bounded"), num_partitions=1, segment_max_records=5
    )
    for chunk in range(4):
        s.produce(_batch(spark, [("/b", f"d{chunk}-{i}", 1) for i in range(5)]))

    seen = []
    tail = consume_tail_ordered(
        spark,
        s.path,
        await_new=False,
        batch_size=5,
        sink=lambda rows, _eid: seen.extend(rows),
    )
    assert len(seen) == 20  # the sink got everything
    assert tail._delivered == []  # nothing retained: O(1), not O(batches)
    assert tail.delivered_vv() == VersionVector({1: 20})
    with pytest.raises(RuntimeError, match="not.*retained|retained"):
        tail.rows()
    with pytest.raises(RuntimeError):
        tail.batches()
    # without a sink the buffering contract is unchanged
    tail2 = consume_tail_ordered(spark, s.path, await_new=False, batch_size=5)
    assert len(tail2.rows()) == 20
    assert tail2.delivered_vv() == VersionVector({1: 20})
    s.drop()


def test_dedup_ingest_cross_batch_and_replay_safe(spark, tmp_path):
    """Unbounded cross-batch dedup (streaming/dedup_ingest.py): a key
    accepted in an early micro-batch stays rejected in every later one
    (no watermark horizon), a crash-replayed batch overwrites its own
    shard instead of double-inserting, and a RESTARTED ingest over a
    grown stream accepts only genuinely new keys."""
    from pyspark.sql import functions as F

    from flo_spark.streaming.dedup_ingest import (
        accepted_keys,
        dedup_ingest,
        fold_batch,
    )

    s = EventStream.create(
        spark, str(tmp_path / "ingest"), num_partitions=1, segment_max_records=4
    )
    # 3 segments; payloads repeat across segments (d0..d3 twice, d4..d7)
    for chunk in range(2):
        s.produce(_batch(spark, [("/i", f"d{i}", 1) for i in range(4)]))
    s.produce(_batch(spark, [("/i", f"d{i}", 1) for i in range(4, 8)]))

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    key = F.md5(F.col("data").cast("binary"))
    stream = consume_stream(spark, s.path, max_files_per_trigger=1)
    got = dedup_ingest(stream, store, key, ckpt)
    assert got.count() == 8  # d0..d7 exactly once despite cross-batch dupes
    # multiple batches really happened (one shard per non-empty batch)
    import os

    shards = [d for d in os.listdir(store) if d.startswith("batch=")]
    assert len(shards) >= 2, shards

    # crash replay: re-fold an already-folded batch id by hand -> store
    # unchanged (the shard overwrites itself)
    replay = spark.createDataFrame(
        [("d0",), ("d4",), ("brandnew",)], ["data"]
    ).select(F.col("data").cast("binary").alias("data"))
    fold_batch(replay, batch_id=0, store_dir=store, key=key)
    n_after_replay = accepted_keys(spark, store).count()
    fold_batch(replay, batch_id=0, store_dir=store, key=key)
    assert accepted_keys(spark, store).count() == n_after_replay

    # restart over a grown stream: only the new payload is accepted
    s.produce(
        _batch(spark, [("/i", "d0", 1), ("/i", "fresh", 1)])
    )
    stream2 = consume_stream(spark, s.path, max_files_per_trigger=1)
    got2 = dedup_ingest(stream2, store, key, ckpt)
    hashes = {r.dedup_key for r in got2.collect()}
    import hashlib

    assert hashlib.md5(b"fresh").hexdigest() in hashes
    assert got2.count() == n_after_replay + 1
    s.drop()


def test_dedup_store_compaction_preserves_semantics(spark, tmp_path):
    """Compacting the seen-store must not change the accepted set and
    must stay replay-safe: ingest after compaction still rejects old
    keys and accepts new ones."""
    from pyspark.sql import functions as F

    from flo_spark.streaming.dedup_ingest import (
        accepted_keys,
        compact_store,
        dedup_ingest,
    )

    s = EventStream.create(
        spark, str(tmp_path / "cmp"), num_partitions=1, segment_max_records=3
    )
    s.produce(_batch(spark, [("/c", f"k{i}", 1) for i in range(6)]))
    store = str(tmp_path / "store")
    key = F.md5(F.col("data").cast("binary"))
    dedup_ingest(
        consume_stream(spark, s.path, max_files_per_trigger=1),
        store,
        key,
        str(tmp_path / "ck1"),
    )
    before = {r.dedup_key for r in accepted_keys(spark, store).collect()}
    assert compact_store(spark, store) == 6
    import os

    shards = [d for d in os.listdir(store) if d.startswith("batch=")]
    assert shards == ["batch=-1"]
    assert {r.dedup_key for r in accepted_keys(spark, store).collect()} == before

    s.produce(_batch(spark, [("/c", "k0", 1), ("/c", "k9", 1)]))
    got = dedup_ingest(
        consume_stream(spark, s.path, max_files_per_trigger=1),
        store,
        key,
        str(tmp_path / "ck1"),
    )
    assert got.count() == 7  # only k9 newly accepted
    s.drop()


def test_drop_duplicates_within_watermark_state_ttl(spark, tmp_path):
    """dropDuplicatesWithinWatermark: dedup state lives only for the
    watermark delay — the bounded-state alternative to global
    dropDuplicates (whose key store grows forever).  Pin the eviction
    semantics: a key re-arriving AFTER its state expired is emitted
    again; one re-arriving while state is live is dropped.

    Timeline (delay 10 min): batch 1 carries k_old@10:00, k_live@10:18,
    k_dup twice@10:19, plus a 10:30 row that advances the watermark to
    10:20 for batch 2.  k_old's state (expires 10:10) is evicted;
    k_live's (expires 10:28) survives.  Batch 2 re-sends both at 10:25:
    k_old is re-emitted, k_live is dropped."""
    import datetime as dt

    src = tmp_path / "src"
    src.mkdir()

    def write_file(name, rows):
        spark.createDataFrame(
            [(k, dt.datetime(2024, 1, 1, *hm)) for k, hm in rows],
            "k string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(str(src / name))

    write_file(
        "b1",
        [
            ("k_old", (10, 0)),
            ("k_live", (10, 18)),
            ("k_dup", (10, 19)),
            ("k_dup", (10, 19)),
            ("wm_pusher", (10, 30)),
        ],
    )
    sdf = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["k"])
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {r.k for r in spark.sql("SELECT k FROM wm_dedup").collect()}
        assert got1 == {"k_old", "k_live", "k_dup", "wm_pusher"}
        assert spark.table("wm_dedup").count() == 4  # in-batch dup dropped

        write_file("b2", [("k_old", (10, 25)), ("k_live", (10, 25))])
        q.processAllAvailable()
        counts = {
            r.k: r.n
            for r in spark.sql(
                "SELECT k, count(*) AS n FROM wm_dedup GROUP BY k"
            ).collect()
        }
        # expired state => re-emitted; live state => still deduped
        assert counts["k_old"] == 2, counts
        assert counts["k_live"] == 1, counts
    finally:
        q.stop()


def test_stream_stream_left_outer_emits_null_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: a left row with no match within
    the join window emits WITH NULLS only after the watermark passes
    the window's end (state eviction) — never eagerly.  Pin both
    halves: the matched row joins normally; the unmatched row appears
    exactly once, null-extended, after late data advances the
    watermark."""
    import datetime as dt

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()

    def write(d, name, rows):
        spark.createDataFrame(
            [(ad, dt.datetime(2024, 1, 1, *hm)) for ad, hm in rows],
            "ad string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(str(d / name))

    write(imp_dir, "b1", [("adA", (10, 0)), ("adB", (10, 0))])
    write(clk_dir, "b1", [("adA", (10, 5))])
    imp = (
        spark.readStream.schema("ad string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(imp_dir / "*"))
        .withWatermark("ts", "0 seconds")
        .select(F.col("ad"), F.col("ts").alias("imp_ts"))
    )
    clk = (
        spark.readStream.schema("ad string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(clk_dir / "*"))
        .withWatermark("ts", "0 seconds")
        .select(F.col("ad").alias("c_ad"), F.col("ts").alias("clk_ts"))
    )
    joined = imp.join(
        clk,
        F.expr(
            "ad = c_ad AND clk_ts >= imp_ts"
            " AND clk_ts <= imp_ts + interval 10 minutes"
        ),
        "leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_left_outer")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.ad: r.clk_ts for r in spark.table("ss_left_outer").collect()
        }
        assert got.get("adA") is not None  # matched within the window
        # adB unmatched: null emission only after the watermark passes
        # imp_ts + 10min; push both streams past it
        write(imp_dir, "b2", [("late1", (11, 0))])
        write(clk_dir, "b2", [("late2", (11, 0))])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT ad, clk_ts FROM ss_left_outer WHERE ad = 'adB'"
        ).collect()
        assert len(rows) == 1 and rows[0].clk_ts is None, rows
    finally:
        q.stop()


def test_watermark_late_rows_dropped_metric(spark, tmp_path):
    """The stream_late_data_drop_audit construction's load-bearing
    claim, pinned via progress metrics: after a restart that committed
    an event-time watermark, rows older than the watermark are dropped
    BEFORE the state store and the engine reports exactly how many
    (numRowsDroppedByWatermark)."""
    import datetime

    from pyspark.sql import functions as F

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows1 = [(base + datetime.timedelta(minutes=i), "a") for i in range(30)]
    late = [
        (base - datetime.timedelta(hours=40, minutes=i), "a") for i in range(7)
    ]
    schema = "ts timestamp, event_type string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(feed)

    drops = []

    def drain():
        src = spark.readStream.schema(schema).parquet(feed)
        agg = (
            src.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .count()
        )
        q = (
            agg.writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        for p in q.recentProgress:
            for op in p["stateOperators"]:
                drops.append(op["numRowsDroppedByWatermark"])

    drain()
    assert sum(drops) == 0  # first run: watermark starts at 0, nothing late
    spark.createDataFrame(late, schema).coalesce(1).write.mode(
        "append"
    ).parquet(feed)
    drain()
    # second run resumes with watermark = max(wave1) - 1h from the
    # checkpoint; every late row (40h older) is dropped BEFORE the
    # state store.  The metric counts state-store INPUT rows, i.e.
    # after map-side partial aggregation: the 7 raw rows collapse to
    # one partial per distinct (hour window, type) — that granularity
    # is itself worth pinning (drops cost no state churn AND no
    # shuffle of raw rows).
    late_groups = {ts.replace(minute=0, second=0) for ts, _ in late}
    assert sum(drops) == len(late_groups) == 2
