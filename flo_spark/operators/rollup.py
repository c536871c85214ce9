"""Hypertable-style time-bucket rollups (continuous aggregates).

The TimescaleDB/Druid pattern re-expressed Spark-first: aggregate the
raw event stream ONCE into a small time-bucketed rollup table, then
answer coarser queries by RE-aggregating the rollup instead of
rescanning raw data.  At 100 TB this is the difference between a
full-table scan per dashboard query and a scan of a table ~10^4×
smaller: the hourly rollup of a 100 TB event table is GBs.

Correctness requirement: every aggregate kept in the rollup must be
re-aggregable (decomposable): sum→sum, count→sum, min→min, max→max;
avg is derived as sum/count at query time (never averaged directly).
This mirrors the partial/final split Spark's own hash aggregate does
between map and reduce sides — applied across *tables* instead of
stages.

Incremental maintenance: `maintain_rollup` upserts only the buckets
present in a new micro-batch (foreachBatch-friendly), so a streaming
ingest keeps the rollup fresh without recomputing history — flo's
append-only segment model (SURVEY.md §1.3) applied to aggregates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _rollup_aggs() -> list:
    """Value aggregates materialized per bucket — all decomposable.
    (Built lazily: Column construction needs an active SparkContext.)"""
    return [
        F.count("*").alias("n_events"),
        # Sum in DECIMAL so partials are EXACT and re-aggregation is
        # order-insensitive: double sums in a different order than the
        # raw aggregate can flip a cent at a .xx5 rounding boundary
        # (the q7 class bug).  Inputs have <=4 fractional digits, so
        # decimal(18,4) loses nothing; the partial is pinned at
        # decimal(38,4) so the parquet schema stays stable across
        # maintenance iterations (sum of decimal widens precision).
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]


def rollup_events(
    events: DataFrame,
    bucket: str = "1 hour",
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Time-bucketed rollup of an events frame (one shuffle, map-side
    partial aggregation included by Spark's hash aggregate)."""
    keys = keys or []
    return (
        events.groupBy(
            F.window(F.col(ts_col), bucket)["start"].alias("bucket"), *keys
        )
        .agg(*_rollup_aggs())
    )


def reaggregate(
    rollup: DataFrame,
    bucket: str = "1 day",
    keys: list[str] | None = None,
) -> DataFrame:
    """Coarsen a rollup to a wider bucket WITHOUT touching raw data.

    sum-of-sums / sum-of-counts / min-of-mins / max-of-maxs; avg is
    derived.  Input `bucket` column must be finer than the target."""
    keys = keys or []
    return (
        rollup.groupBy(
            F.window(F.col("bucket"), bucket)["start"].alias("bucket"), *keys
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("decimal(38,4)").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn(
            "avg_value", F.col("sum_value").cast("double") / F.col("n_events")
        )
    )


def maintain_rollup(
    rollup_path: str,
    batch: DataFrame,
    bucket: str = "1 hour",
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> None:
    """Incrementally fold a new batch into a parquet rollup table.

    Only the time buckets present in `batch` are recomputed (merge of
    old partials + new partials over the affected buckets); untouched
    history is never rewritten.  Bucket-partitioned output keeps the
    rewrite O(affected buckets) — usable directly as a foreachBatch
    sink for streaming ingest."""
    keys = keys or []
    spark = batch.sparkSession
    new_part = rollup_events(batch, bucket, keys, ts_col)

    if os.path.isdir(rollup_path) and any(
        f.endswith(".parquet") or f.startswith("bucket_day=")
        for f in os.listdir(rollup_path)
    ):
        existing = spark.read.parquet(rollup_path)
        affected = new_part.select("bucket").distinct()
        overlap = existing.join(F.broadcast(affected), "bucket", "left_semi")
        keep = existing.join(F.broadcast(affected), "bucket", "left_anti")
        merged_cols = ["bucket", *keys]
        merged = (
            overlap.unionByName(new_part)
            .groupBy(*merged_cols)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").cast("decimal(38,4)").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        out = keep.unionByName(merged)
    else:
        out = new_part

    tmp = rollup_path.rstrip("/") + "__tmp"
    out.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(rollup_path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
