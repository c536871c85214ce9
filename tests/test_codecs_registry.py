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
