"""Hypertable rollup: lossless two-level aggregation + incremental
maintenance (flo_spark/operators/rollup.py)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from flo_spark.operators.rollup import maintain_rollup, reaggregate, rollup_events


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                ts=datetime.datetime(2024, 1, d, h, m),
                event_type=t,
                value=float(v),
            )
            for d, h, m, t, v in rows
        ]
    )


def test_reaggregate_matches_direct_daily(spark):
    ev = _events(
        spark,
        [
            (1, 0, 5, "click", 1.0),
            (1, 0, 45, "click", 2.5),
            (1, 3, 0, "view", 4.0),
            (2, 10, 0, "click", -1.0),
        ],
    )
    daily_via_rollup = reaggregate(
        rollup_events(ev, "1 hour", ["event_type"]), "1 day", ["event_type"]
    )
    direct = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            # same exact-decimal partial type the rollup materializes
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .withColumn(
            "avg_value", F.col("sum_value").cast("double") / F.col("n_events")
        )
    )
    cols = sorted(daily_via_rollup.columns)
    a = sorted(map(tuple, daily_via_rollup.select(cols).collect()))
    b = sorted(map(tuple, direct.select(cols).collect()))
    assert a == b


def test_incremental_maintenance_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    batch1 = _events(
        spark, [(1, 0, 5, "click", 1.0), (1, 1, 0, "view", 2.0)]
    )
    batch2 = _events(
        spark,
        [
            (1, 0, 30, "click", 3.0),  # touches an existing bucket
            (2, 5, 0, "click", 4.0),  # new bucket
        ],
    )
    maintain_rollup(path, batch1, "1 hour", ["event_type"])
    maintain_rollup(path, batch2, "1 hour", ["event_type"])
    got = spark.read.parquet(path)
    want = rollup_events(
        batch1.unionByName(batch2), "1 hour", ["event_type"]
    )
    cols = sorted(want.columns)
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )
