"""Codec projections (A17) + stream registry / SetEventStream (A14)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flo_spark.functions import codecs
from flo_spark.sources.event_table import EventStream, StreamRegistry


def test_codec_round_trip(spark):
    df = spark.createDataFrame([Row(text='{"a": 7, "b": "x"}')])
    encoded = df.select(codecs.encode_utf8(F.col("text")).alias("data"))
    decoded = encoded.select(
        codecs.utf8(F.col("data")).alias("s"),
        codecs.json_field(F.col("data"), "$.a").alias("a"),
        codecs.json(F.col("data"), "a INT, b STRING").alias("j"),
    ).collect()[0]
    assert decoded.s == '{"a": 7, "b": "x"}'
    assert decoded.a == "7"
    assert decoded.j.a == 7 and decoded.j.b == "x"


def test_json_struct_encode(spark):
    df = spark.createDataFrame([Row(a=1, b="z")])
    out = df.select(
        codecs.encode_json(F.struct("a", "b")).alias("data")
    ).select(codecs.utf8(F.col("data")).alias("s")).collect()[0]
    assert out.s == '{"a":1,"b":"z"}'


def test_registry_set_event_stream(spark, tmp_path):
    reg = StreamRegistry(spark, str(tmp_path / "streams"))
    # default stream exists, like flo's "system" stream
    assert reg.stream_names() == ["system"]
    reg.create_stream("orders", num_partitions=2)
    assert reg.stream_names() == ["orders", "system"]

    s = reg.set_event_stream("orders")
    assert s.options["num_partitions"] == 2
    s.produce(
        spark.createDataFrame([Row(namespace="/o", data=bytearray(b"x"), partition=1)])
    )
    assert reg.current().highest_counter() == 1

    with pytest.raises(KeyError, match="NoSuchStream"):
        reg.set_event_stream("nope")
    with pytest.raises(ValueError):
        reg.create_stream("../escape")


def test_sample_frames_fans_out_bounded(spark):
    from flo_spark.operators.multimodal import sample_frames

    from pyspark.sql import functions as F

    assets = spark.createDataFrame(
        [(1, b"vid-a", 3500), (2, b"vid-b", 20000), (3, b"img", None)],
        "asset_id long, data binary, duration_ms int",
    ).select(
        "asset_id",
        "data",
        F.struct(
            F.lit("video/mp4").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("duration_ms"),
        ).alias("meta"),
    )
    rows = sample_frames(assets, every_ms=1000, max_frames=8).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert len(by_asset[1]) == 4       # ceil(3500/1000)
    assert len(by_asset[2]) == 8       # capped at max_frames
    assert len(by_asset[3]) == 1       # still asset -> one frame
    f = sorted(by_asset[1], key=lambda r: r.frame_idx)
    assert [r.ts_ms for r in f] == [0, 1000, 2000, 3000]
    assert len({r.frame_sha for r in rows}) == len(rows)  # per-frame distinct


def test_resize_updates_meta_keeps_schema(spark):
    from flo_spark.operators.multimodal import documents_as_assets, resize_images
    from flo_spark.queries import load

    d = load(spark, "/root/testdata/sf0.001", "documents").limit(10)
    assets = documents_as_assets(d)
    out = resize_images(assets, 224, 224)
    assert out.schema == assets.schema
    rows = out.collect()
    assert all(r.meta.width == 224 and r.meta.height == 224 for r in rows)
