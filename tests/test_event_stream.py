"""End-to-end produce→consume round trips — mirrors the reference's
embedded tests (flo-server/tests/embedded_tests.rs:68-338)."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flo_spark.sources.event_table import EventStream


@pytest.fixture()
def stream(spark, tmp_path):
    s = EventStream.create(spark, str(tmp_path / "stream"), num_partitions=3)
    yield s
    s.drop()


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(namespace=ns, data=bytearray(d, "utf8"), partition=p) for ns, d, p in rows]
    )


def test_produce_then_consume_round_trip(spark, stream):
    # embedded_tests.rs:320-338
    stream.produce(_batch(spark, [("/foo/bar", "payload-1", 1)]))
    got = stream.consume().collect()
    assert len(got) == 1
    e = got[0]
    assert e.namespace == "/foo/bar"
    assert bytes(e.data) == b"payload-1"
    assert e.event_counter == 1 and e.actor == 1


def test_ordered_multi_produce(spark, stream):
    # embedded_tests.rs:294-317 — ids are contiguous and ordered
    rows = [("/seq", f"e{i}", (i % 3) + 1) for i in range(102)]
    df = _batch(spark, rows)
    n = stream.produce(df)
    assert n == 102
    got = stream.consume().collect()
    counters = [e.event_counter for e in got]
    assert counters == sorted(counters)
    assert sorted(counters) == list(range(1, 103))  # contiguous, gap-free range


def test_glob_subset_consume(spark, stream):
    # embedded_tests.rs:223-251 / sync_client_tests.rs:179-206
    rows = [
        ("/meals/breakfast/foods/bacon", "b", 1),
        ("/meals/breakfast/foods/eggs", "e", 2),
        ("/meals/breakfast/drinks/coffee", "c", 3),
        ("/meals/lunch/drinks/soda", "s", 1),
        ("/meals/breakfast", "m", 2),
    ]
    stream.produce(_batch(spark, rows))
    foods = stream.consume(namespace="/meals/breakfast/foods/*").collect()
    assert sorted(e.namespace for e in foods) == [
        "/meals/breakfast/foods/bacon",
        "/meals/breakfast/foods/eggs",
    ]
    drinks = stream.consume(namespace="/**/drinks/*").collect()
    assert sorted(e.namespace for e in drinks) == [
        "/meals/breakfast/drinks/coffee",
        "/meals/lunch/drinks/soda",
    ]
    exact = stream.consume(namespace="/meals/breakfast").collect()
    assert [e.namespace for e in exact] == ["/meals/breakfast"]


def test_multi_partition_merge_preserves_id_order(spark, stream):
    # embedded_tests.rs:169-200
    stream.produce(_batch(spark, [("/ns", f"d{i}", (i % 3) + 1) for i in range(30)]))
    got = stream.consume().collect()
    ids = [(e.event_counter, e.actor) for e in got]
    assert ids == sorted(ids)
    assert len(ids) == 30


def test_version_vector_resume(spark, stream):
    # sync/mod.rs:124-130 — exclusive lower bound; absent partitions not read
    stream.produce(_batch(spark, [("/ns", f"d{i}", (i % 3) + 1) for i in range(30)]))
    heads = stream.head()
    # consume only partition 1, from its midpoint
    mid = {1: heads[1] - 2}
    got = stream.consume(version_vector=mid).collect()
    assert all(e.actor == 1 for e in got)
    assert len(got) == 2
    assert all(e.event_counter > heads[1] - 2 for e in got)


def test_limit(spark, stream):
    # A7: stop after N across all partitions; 0 = unlimited
    stream.produce(_batch(spark, [("/ns", f"d{i}", (i % 3) + 1) for i in range(30)]))
    got = stream.consume(limit=7).collect()
    assert len(got) == 7
    ids = [(e.event_counter, e.actor) for e in got]
    assert ids == sorted(ids)  # limit applies AFTER global order (lowest ids)
    assert got[0].event_counter == 1
    assert len(stream.consume(limit=0).collect()) == 30


def test_head_status(spark, stream):
    # A13
    assert stream.head() == {1: 0, 2: 0, 3: 0}
    stream.produce(_batch(spark, [("/ns", "x", 1), ("/ns", "y", 1), ("/ns", "z", 2)]))
    heads = stream.head()
    assert set(heads) == {1, 2, 3}
    assert heads[3] == 0
    assert max(heads.values()) == 3


def test_produce_batches_continue_counter(spark, stream):
    stream.produce(_batch(spark, [("/a", "1", 1)]))
    stream.produce(_batch(spark, [("/b", "2", 2)]))
    got = stream.consume().collect()
    assert [e.event_counter for e in got] == [1, 2]


def test_lineage(spark, stream):
    # A16 parent-id round trip
    from flo_spark.operators.consume import lineage_join

    stream.produce(_batch(spark, [("/req", "r", 1)]))
    resp = spark.createDataFrame(
        [
            Row(
                namespace="/resp",
                data=bytearray(b"ok"),
                partition=2,
                parent_counter=1,
                parent_actor=1,
            )
        ]
    )
    stream.produce(resp)
    events = stream.events()
    joined = lineage_join(events).filter(F.col("namespace") == "/resp").collect()
    assert len(joined) == 1
    assert joined[0].parent_namespace == "/req"


def test_retention_expiry(spark, tmp_path):
    # embedded_tests.rs:105-146 — TTL drops oldest whole segments
    s = EventStream.create(
        spark, str(tmp_path / "ttl"), num_partitions=1, event_retention_seconds=3600
    )
    s.produce(_batch(spark, [("/old", "x", 1)]))
    # nothing expired yet
    assert s.expire_old_events() == 0
    future = datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(hours=2)
    deleted = s.expire_old_events(now=future)
    assert deleted >= 1
    assert s.consume().count() == 0
    s.drop()


def test_retention_expiry_namespace_partitioned(spark, tmp_path):
    # regression: expiry must recurse into ns0=<seg>/ subdirs — the
    # non-recursive glob silently deleted nothing on such streams
    s = EventStream.create(
        spark,
        str(tmp_path / "ttl_ns"),
        num_partitions=2,
        event_retention_seconds=3600,
        namespace_partitioning=True,
    )
    s.produce(_batch(spark, [("/a/x", "1", 1), ("/b/y", "2", 2)]))
    assert s.expire_old_events() == 0
    future = datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(hours=2)
    assert s.expire_old_events(now=future) >= 2  # one file per (partition, ns0)
    assert s.consume().count() == 0
    s.drop()


def test_produce_ack_ranges(spark, stream):
    # producer.rs:47-81 — produce resolves to the assigned ids
    ack = stream.produce(
        _batch(spark, [("/ns", f"d{i}", (i % 3) + 1) for i in range(30)])
    )
    assert ack == 30  # int-compatible
    assert ack.ranges == {1: (1, 10), 2: (11, 20), 3: (21, 30)}
    assert ack.first_counter == 1 and ack.last_counter == 30
    ack2 = stream.produce(_batch(spark, [("/ns", "x", 2)]))
    assert ack2 == 1
    assert ack2.ranges == {2: (31, 31)}


def test_produce_single_materialization(spark, stream):
    # the counts job fills the cache; the write drains it — the input
    # plan must evaluate exactly once per append (was 3× before)
    from pyspark.sql import types as T

    evals = spark.sparkContext.accumulator(0)

    def _counting(it):
        for pdf in it:
            evals.add(len(pdf))
            yield pdf

    src = _batch(spark, [("/ns", f"d{i}", (i % 3) + 1) for i in range(12)])
    counted = src.mapInPandas(_counting, schema=src.schema)
    ack = stream.produce(counted)
    assert ack == 12
    assert evals.value == 12, f"input evaluated {evals.value/12:.0f}x, want 1x"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "xml"])
def test_export_import_round_trip(spark, stream, tmp_path, fmt):
    stream.produce(
        _batch(
            spark,
            [("/foo/bar", "payload-1", 1), ("/foo/baz", "payload-2", 2)],
        )
    )
    out = str(tmp_path / f"export_{fmt}")
    assert stream.export(out, fmt) == 2
    back = EventStream.read_events(spark, out, fmt)
    orig = stream.events()
    key = ["event_counter", "actor", "namespace"]
    a = sorted(
        (r["event_counter"], r["actor"], r["namespace"], bytes(r["data"]))
        for r in orig.collect()
    )
    b = sorted(
        (r["event_counter"], r["actor"], r["namespace"], bytes(r["data"]))
        for r in back.collect()
    )
    assert a == b
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in orig.schema.fields
    ]


def test_namespace_partition_pruning(spark, tmp_path):
    # SURVEY.md §4 namespace-pruning rule: a glob with a literal first
    # segment prunes prefix directories at the file listing.
    s = EventStream.create(
        spark,
        str(tmp_path / "nsp"),
        num_partitions=2,
        namespace_partitioning=True,
    )
    s.produce(
        _batch(
            spark,
            [
                ("/orders/eu/created", "a", 1),
                ("/orders/us/created", "b", 2),
                ("/users/new", "c", 1),
                ("relative/ns", "d", 2),
            ],
        )
    )
    df = s.consume(namespace="/orders/**")
    assert sorted(r["namespace"] for r in df.collect()) == [
        "/orders/eu/created",
        "/orders/us/created",
    ]
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("ns0" in l for l in pf), "ns0 not in PartitionFilters"
    # non-literal first segment: no pruning, still correct
    # ('*s*' matches both 'orders' and 'users'; the relative-path event
    # fails the leading '/')
    assert s.consume(namespace="/*s*/**").count() == 3
    assert s.consume(namespace="/u*/**").count() == 1
    # full consume unaffected by the extra storage column
    got = s.consume().collect()
    assert len(got) == 4
    assert "ns0" not in s.events().columns


def _file_count(stream):
    import glob as g
    import os

    return len(
        g.glob(os.path.join(stream.path, "partition=*", "**", "*.parquet"), recursive=True)
    )


def test_compact_segments_merges_small_files(spark, tmp_path):
    s = EventStream.create(
        spark, str(tmp_path / "frag"), num_partitions=2, segment_max_records=200
    )
    try:
        # 6 tiny produces -> >= 6 files per partition, all far under seg_max
        for i in range(6):
            s.produce(_batch(spark, [(f"/ns/{i}/{j}", f"d{i}-{j}", (j % 2) + 1) for j in range(20)]))
        before_rows = sorted(
            (e.event_counter, e.partition, e.namespace, bytes(e.data))
            for e in s.consume().collect()
        )
        before_files = _file_count(s)
        before_head = s.head()

        report = s.compact_segments()

        assert report["dirs_compacted"] == 2
        assert report["files_removed"] >= 2 * 6
        after_files = _file_count(s)
        assert after_files < before_files
        # 120 rows total, seg_max 200 -> exactly one file per partition
        assert after_files == 2
        # consume is unchanged: same rows, ids, payloads; head unchanged
        after_rows = sorted(
            (e.event_counter, e.partition, e.namespace, bytes(e.data))
            for e in s.consume().collect()
        )
        assert after_rows == before_rows
        assert s.head() == before_head
        # full segments are not rewritten on a second pass
        assert s.compact_segments() == {
            "dirs_compacted": 0,
            "files_removed": 0,
            "files_written": 0,
        }
    finally:
        s.drop()


def test_compact_segments_namespace_partitioned(spark, tmp_path):
    s = EventStream.create(
        spark,
        str(tmp_path / "fragns"),
        num_partitions=1,
        segment_max_records=500,
        namespace_partitioning=True,
    )
    try:
        for i in range(4):
            s.produce(
                _batch(
                    spark,
                    [("/alpha/x", f"a{i}", 1), ("/beta/y", f"b{i}", 1)],
                )
            )
        before = sorted(
            (e.event_counter, e.namespace, bytes(e.data))
            for e in s.consume().collect()
        )
        report = s.compact_segments()
        assert report["dirs_compacted"] == 2  # ns0=alpha and ns0=beta leaves
        after = sorted(
            (e.event_counter, e.namespace, bytes(e.data))
            for e in s.consume().collect()
        )
        assert after == before
        # prefix pruning still works on the compacted layout
        got = s.consume(namespace="/alpha/*").collect()
        assert sorted(e.namespace for e in got) == ["/alpha/x"] * 4
    finally:
        s.drop()


def test_compact_preserves_counter_pushdown_stats(spark, tmp_path):
    import glob as g
    import os

    import pyarrow.parquet as pq

    s = EventStream.create(
        spark, str(tmp_path / "fragidx"), num_partitions=1, segment_max_records=50
    )
    try:
        for i in range(6):
            s.produce(_batch(spark, [(f"/n/{i}", f"p{i}-{j}", 1) for j in range(20)]))
        s.compact_segments()
        # 120 rows, seg_max 50 -> 3 files; counter ranges must be disjoint
        # and monotone so row-group stats still act as the seek index
        ranges = []
        for f in sorted(
            g.glob(os.path.join(s.path, "partition=*", "*.parquet"))
        ):
            meta = pq.read_metadata(f)
            idx = list(meta.schema.to_arrow_schema().names).index("event_counter")
            mins = [meta.row_group(r).column(idx).statistics.min for r in range(meta.num_row_groups)]
            maxs = [meta.row_group(r).column(idx).statistics.max for r in range(meta.num_row_groups)]
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        assert len(ranges) == 3
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2  # disjoint, ordered
    finally:
        s.drop()


def test_produce_empty_batch(spark, stream):
    # an empty batch: schema-only DataFrame, no rows
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("namespace", T.StringType()),
            T.StructField("data", T.BinaryType()),
            T.StructField("partition", T.IntegerType()),
        ])
    )
    ack = stream.produce(empty)
    assert ack == 0
    assert stream.consume().count() == 0
    assert stream.highest_counter() == 0


def test_registry_drop_stream(spark, tmp_path):
    from flo_spark.sources.event_table import StreamRegistry

    reg = StreamRegistry(spark, str(tmp_path / "root"))
    reg.create_stream("orders")
    assert "orders" in reg.stream_names()
    reg.drop_stream("orders")
    assert "orders" not in reg.stream_names()
    with pytest.raises(KeyError, match="NoSuchStream"):
        reg.drop_stream("orders")
    # dropping the current (default) stream resets and recreates it
    reg.drop_stream(reg.DEFAULT_STREAM)
    assert reg.DEFAULT_STREAM in reg.stream_names()
    assert reg.current().consume().count() == 0


def test_lifecycle_expire_compact_consume(spark, tmp_path):
    # full maintenance lifecycle: produce (fragmented) -> TTL expiry
    # drops old segments -> compaction merges the survivors -> consume
    # returns exactly the retained events in id order
    s = EventStream.create(
        spark,
        str(tmp_path / "life"),
        num_partitions=2,
        segment_max_records=100,
        event_retention_seconds=3600,
    )
    try:
        for i in range(4):
            s.produce(_batch(spark, [(f"/old/{i}", f"o{j}", (j % 2) + 1) for j in range(10)]))
        # expire everything written so far (evaluated at now+2h > TTL)
        future = datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(hours=2)
        deleted = s.expire_old_events(now=future)
        assert deleted >= 2
        assert s.consume().count() == 0
        head_after_expiry = s.highest_counter()
        for i in range(3):
            s.produce(_batch(spark, [(f"/fresh/{i}", f"f{j}", (j % 2) + 1) for j in range(10)]))
        report = s.compact_segments()
        assert report["dirs_compacted"] == 2
        got = s.consume().collect()
        assert len(got) == 30
        ids = [(e.event_counter, e.actor) for e in got]
        assert ids == sorted(ids)
        # counters continue past the expired range (no id reuse after expiry)
        assert min(e.event_counter for e in got) == head_after_expiry + 1
    finally:
        s.drop()


def test_produce_requires_namespace_column(spark, stream):
    bad = spark.createDataFrame([Row(data=bytearray(b"x"), partition=1)])
    with pytest.raises(ValueError, match="namespace"):
        stream.produce(bad)


def test_status_snapshot(spark, stream):
    st = stream.status()
    assert st["highest_counter"] == 0
    assert all(v == {"head": 0, "segments": 0, "bytes": 0} for v in st["partitions"].values())
    stream.produce(_batch(spark, [("/ns", f"d{i}", (i % 3) + 1) for i in range(30)]))
    st = stream.status()
    assert st["name"] == "stream"
    assert st["highest_counter"] == 30
    assert set(st["partitions"]) == {1, 2, 3}
    for p in (1, 2, 3):
        info = st["partitions"][p]
        assert info["segments"] >= 1 and info["bytes"] > 0
        assert info["head"] > 0
