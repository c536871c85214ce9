"""Operational-surface coverage: df.observe metrics (no extra pass),
StreamingQueryListener lifecycle, and schema evolution across
segments written by producers of different vintages."""

import time

from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def test_observe_collects_metrics_without_second_pass(spark, sf_dir):
    """observe() piggybacks named aggregates on the action that
    already runs — the zero-cost audit hook for 100 TB pipelines
    (counting rows with a second .count() would re-scan the corpus)."""
    from flo_spark import queries as Q

    obs = Observation("q1_audit")
    df = Q.q1_pricing_summary(spark, sf_dir).observe(
        obs,
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("sum_qty").alias("total_qty"),
    )
    rows = df.collect()
    assert obs.get["n_groups"] == len(rows)
    assert obs.get["total_qty"] == sum(r.sum_qty for r in rows)


def test_streaming_query_listener_lifecycle(spark, tmp_path):
    """StreamingQueryListener sees start -> progress -> termination
    for a drain — the ops hook monitoring dashboards build on."""
    events = {"started": 0, "progress": 0, "terminated": 0}

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            events["started"] += 1

        def onQueryProgress(self, e):
            events["progress"] += 1

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events["terminated"] += 1

    listener = L()
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "src"
        spark.createDataFrame([(1,), (2,)], "v long").write.parquet(
            str(src)
        )
        q = (
            spark.readStream.schema("v long")
            .parquet(str(src))
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        deadline = time.time() + 30
        while (
            events["started"] == 0
            or events["terminated"] == 0
            or events["progress"] == 0
        ) and time.time() < deadline:
            time.sleep(0.5)  # listener bus is async
        assert events["started"] >= 1
        assert events["progress"] >= 1
        assert events["terminated"] >= 1
    finally:
        spark.streams.removeListener(listener)


def test_segment_schema_evolution_mergeschema(spark, tmp_path):
    """Segments written before a payload column existed read back
    with the union schema and nulls for the missing column — the
    contract that lets a year-old event store serve queries written
    against today's schema."""
    old = tmp_path / "t" / "old"
    new = tmp_path / "t" / "new"
    spark.createDataFrame(
        [(1, "a")], "event_counter long, namespace string"
    ).write.parquet(str(old))
    spark.createDataFrame(
        [(2, "b", "r1")],
        "event_counter long, namespace string, region string",
    ).write.parquet(str(new))
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(str(tmp_path / "t" / "*"))
        .orderBy("event_counter")
    )
    assert [f.name for f in df.schema.fields] == [
        "event_counter",
        "namespace",
        "region",
    ]
    rows = df.collect()
    assert rows[0].region is None and rows[1].region == "r1"
