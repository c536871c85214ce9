"""Produce path — append events with contiguous, stream-wide-unique ids.

flo reserves a contiguous counter range per produce batch from one
stream-wide atomic (reference: flo-server/.../highest_counter.rs:43-62,
used at partition/controller/mod.rs:192-215), then stamps the server
timestamp at persist time (controller/mod.rs:197).  Counters are unique
across the whole stream; per-partition sequences may have gaps.

Spark-first design for the same guarantee WITHOUT a global sort:

1. one tiny aggregate -> per-partition row counts (num_partitions rows
   to the driver — O(partitions), not O(rows));
2. cumulative offsets give each partition a contiguous sub-range of the
   batch's reserved range  [head+1, head+N];
3. ``row_number`` over a window partitioned by ``partition`` assigns
   in-partition positions fully in parallel (no single-reducer shuffle,
   unlike a global ``row_number`` — this is the piece that survives a
   1000-executor scale-up).

NOT ``monotonically_increasing_id`` — that has gaps (SURVEY.md A15).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_event_ids(
    batch: DataFrame,
    base_counter: int,
    partition_col: str = "partition",
    order_by: Column | str | None = None,
) -> DataFrame:
    """Assign contiguous ``event_counter`` values ``base_counter+1 ..
    base_counter+N`` to a produce batch.

    ``order_by`` fixes the in-partition ordering (defaults to an
    arbitrary-but-stable capture of input order).  ``actor`` is set to
    the partition id, as in flo where ActorId == partition id.
    """
    if order_by is None:
        batch = batch.withColumn("__seq", F.monotonically_increasing_id())
        order_expr = F.col("__seq")
    else:
        order_expr = F.col(order_by) if isinstance(order_by, str) else order_by

    counts = (
        batch.groupBy(partition_col).count().orderBy(partition_col).collect()
    )  # O(num_partitions) rows — never O(data)
    offsets: dict[int, int] = {}
    running = 0
    for row in counts:
        offsets[row[partition_col]] = running
        running += row["count"]

    offset_expr = F.lit(0)
    for part, off in offsets.items():
        offset_expr = F.when(F.col(partition_col) == part, F.lit(off)).otherwise(
            offset_expr
        )

    w = Window.partitionBy(partition_col).orderBy(order_expr)
    out = (
        batch.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "event_counter",
            (F.lit(base_counter) + offset_expr + F.col("__rn")).cast("long"),
        )
        .withColumn("actor", F.col(partition_col).cast("int"))
        .drop("__rn", "__seq")
    )
    return out
