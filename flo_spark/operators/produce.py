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
   batch's reserved range  [head+1, head+N]; the offsets table joins
   back in as a BROADCAST join (num_partitions rows), never a chained
   CASE WHEN — a 10^4-partition stream would otherwise blow up the
   expression tree;
3. ``row_number`` over a window partitioned by ``partition`` assigns
   in-partition positions fully in parallel (no single-reducer shuffle,
   unlike a global ``row_number`` — this is the piece that survives a
   1000-executor scale-up).

The caller is expected to ``persist()`` the batch first so the counts
job and the subsequent write share one materialization of the input
(``EventStream.produce`` does) — at 100 TB ingest, scanning the input
once per append is the difference between one pass and three.

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
    with_ranges: bool = False,
) -> DataFrame | tuple[DataFrame, dict[int, tuple[int, int]]]:
    """Assign contiguous ``event_counter`` values ``base_counter+1 ..
    base_counter+N`` to a produce batch.

    ``order_by`` fixes the in-partition ordering (defaults to an
    arbitrary-but-stable capture of input order).  ``actor`` is set to
    the partition id, as in flo where ActorId == partition id.

    With ``with_ranges=True`` also returns the assigned id ranges per
    partition — ``{partition: (first_counter, last_counter)}`` — the
    produce-ack analog of flo's ``EventId`` resolution
    (connection_handler/producer.rs:47-81).  The ranges are computed
    driver-side from the same per-partition counts that drive offset
    assignment: no extra job.
    """
    if order_by is None:
        batch = batch.withColumn("__seq", F.monotonically_increasing_id())
        order_expr = F.col("__seq")
    else:
        order_expr = F.col(order_by) if isinstance(order_by, str) else order_by

    counts = (
        batch.groupBy(partition_col).count().orderBy(partition_col).collect()
    )  # O(num_partitions) rows — never O(data)
    offsets: list[tuple[int, int]] = []
    ranges: dict[int, tuple[int, int]] = {}
    running = 0
    for row in counts:
        part, n = int(row[partition_col]), int(row["count"])
        offsets.append((part, running))
        ranges[part] = (base_counter + running + 1, base_counter + running + n)
        running += n

    spark = batch.sparkSession
    offsets_df = spark.createDataFrame(
        offsets, schema=f"{partition_col} int, __off long"
    )

    w = Window.partitionBy(partition_col).orderBy(order_expr)
    out = (
        batch.join(F.broadcast(offsets_df), on=partition_col, how="inner")
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "event_counter",
            (F.lit(base_counter) + F.col("__off") + F.col("__rn")).cast("long"),
        )
        .withColumn("actor", F.col(partition_col).cast("int"))
        .drop("__rn", "__seq", "__off")
    )
    if with_ranges:
        return out, ranges
    return out


class ProduceAck(int):
    """Produce acknowledgement: the event count (``int`` for backward
    compatibility) plus the assigned id ranges — flo's produce resolves
    to the ``FloEventId`` the server assigned
    (connection_handler/producer.rs:47-81); here the whole batch acks
    with its contiguous per-partition counter ranges.

    ``ranges``: ``{partition: (first_counter, last_counter)}``.
    """

    ranges: dict[int, tuple[int, int]]

    def __new__(cls, n: int, ranges: dict[int, tuple[int, int]]):
        self = super().__new__(cls, n)
        self.ranges = ranges
        return self

    @property
    def first_counter(self) -> int | None:
        return min((lo for lo, _ in self.ranges.values()), default=None)

    @property
    def last_counter(self) -> int | None:
        return max((hi for _, hi in self.ranges.values()), default=None)
