"""Consume path — the A3..A7 composite (SURVEY.md §2):

scan -> version-vector filter -> namespace glob -> global id order -> limit

flo creates one per-partition cursor per version-vector entry
(reference: flo-server/.../consumer/mod.rs:91-107), seeks each via the
index (controller/mod.rs:300-321), k-way merges by min event_counter
(consumer_stream/multi_partition_reader.rs:8-48), applies the glob
inside each reader (event_reader/mod.rs:60-74), and decrements a
max_events budget (consumer_stream/mod.rs:84-119).

Spark translation — every stage is a Catalyst built-in, so pushdown,
partition pruning, and TopK (``TakeOrderedAndProject``) replace the
hand-built index seek and merge:

- vv filter  -> OR of per-partition ``partition = p AND counter > c``
  predicates.  Plain comparisons on the partition-directory column and
  a parquet stats column => directory pruning + row-group skipping —
  the exact analog of flo's index seek (index.rs:86-129), for free.
- glob       -> ``rlike`` regex (functions/glob.py); '/**/*' fast path
  skips the predicate entirely, as event_reader/mod.rs:27-34 does.
- merge      -> ``orderBy(event_counter, actor)`` — with a ``limit`` on
  top Spark plans TakeOrderedAndProject: per-partition top-k heaps +
  driver merge, NOT a global sort.  Unlimited consumes at scale should
  leave ``order_globally=False`` and order per-partition (flo's global
  order only matters to a single sequential consumer anyway).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flo_spark.functions.glob import glob_to_regex, is_match_all, literal_prefix
from flo_spark.schema import ID_ORDER


def version_vector_filter(
    vv: Mapping[int, int],
    partition_col: str = "partition",
    counter_col: str = "event_counter",
) -> Column:
    """Predicate for a version-vector cursor.

    Only partitions present in the vector are read (sync/mod.rs:124-130);
    each entry is an *exclusive* lower bound: first event returned for
    partition p has counter >= vv[p]+1.
    """
    if not vv:
        return F.lit(False)
    pred = None
    for part, counter in sorted(vv.items()):
        clause = (F.col(partition_col) == int(part)) & (
            F.col(counter_col) > int(counter)
        )
        pred = clause if pred is None else (pred | clause)
    # Redundant global lower bound: the OR-of-ANDs above may contain
    # derived-column terms Catalyst can't push into the parquet scan,
    # but this plain comparison always can — row groups entirely below
    # min(vv) are skipped, which is exactly flo's index seek
    # (index.rs:86-129) expressed as file statistics.
    pred = (F.col(counter_col) > min(int(c) for c in vv.values())) & pred
    return pred


def version_vector_ceiling(
    snapshot: Mapping[int, int],
    partition_col: str = "partition",
    counter_col: str = "event_counter",
) -> Column:
    """Predicate for an AS-OF snapshot read — the engine-extension
    complement of :func:`version_vector_filter`: a version vector read
    as an INCLUSIVE upper bound.  Every event at or below the
    snapshot's per-partition head is visible; partitions absent from
    the snapshot had produced nothing at snapshot time and are
    excluded.  Because counters are immutable and append-only, the
    result is a perfectly reproducible point-in-time view of the
    stream — time travel keyed by the consumer cursor itself (pair
    with a floor vector for an (a, b] window of history).  The plain
    upper comparison pushes into the parquet scan for row-group
    pruning exactly like the floor does."""
    if not snapshot:
        return F.lit(False)
    pred = None
    for part, counter in sorted(snapshot.items()):
        clause = (F.col(partition_col) == int(part)) & (
            F.col(counter_col) <= int(counter)
        )
        pred = clause if pred is None else (pred | clause)
    pred = (
        F.col(counter_col) <= max(int(c) for c in snapshot.values())
    ) & pred
    return pred


def resume_trim_filter(
    delivered: Mapping[int, int],
    partition_col: str = "partition",
    counter_col: str = "event_counter",
) -> Column:
    """Predicate that drops events AT OR BELOW a delivered cursor.

    This is the complement of :func:`version_vector_filter` for
    crash-restart resume: a consume-start vector restricts the scan to
    the listed partitions (sync/mod.rs:124-130), but a resume trim must
    PASS partitions the cursor has never seen and only drop the prefix
    already side-effected before the crash.  flo's consumer gets
    event-granular resume for free because its cursor advances per
    event (consumer_stream/mod.rs:84-119); Spark's file-source
    checkpoint is segment-granular, so the first post-restart batch
    redelivers the in-flight segment — this filter restores per-event
    granularity by trimming that batch against the VersionVector of
    what the consumer actually delivered."""
    pred = F.lit(True)
    for part, counter in sorted(delivered.items()):
        pred = pred & ~(
            (F.col(partition_col) == int(part))
            & (F.col(counter_col) <= int(counter))
        )
    return pred


def namespace_filter(pattern: str | None, namespace_col: str = "namespace") -> Column | None:
    """Glob predicate, or None for the match-all fast path.

    The glob's longest literal prefix rides along as a ``startswith``
    conjunct: the rlike regex can never reach the parquet scan, but
    StringStartsWith does — row groups whose namespace min/max exclude
    the prefix are skipped from statistics alone (plan-pinned in
    tests/test_plans.py).  Semantically redundant (the regex implies
    the prefix), so results are unchanged."""
    if is_match_all(pattern):
        return None
    pred = F.col(namespace_col).rlike(glob_to_regex(pattern))
    prefix = literal_prefix(pattern)
    if prefix:
        pred = F.col(namespace_col).startswith(prefix) & pred
    return pred


def consume(
    events: DataFrame,
    namespace: str | None = None,
    version_vector: Mapping[int, int] | None = None,
    limit: int | None = None,
    order_globally: bool = True,
    as_of: Mapping[int, int] | None = None,
) -> DataFrame:
    """Batch consume — flo's ``consume(namespace, vv, limit, await_new=False)``
    (flo-client-lib/src/async/mod.rs:115-121) as a DataFrame pipeline.

    ``as_of`` (engine extension): an inclusive snapshot ceiling — see
    :func:`version_vector_ceiling`; with ``version_vector`` it reads
    the (floor, snapshot] window of history."""
    df = events
    if version_vector is not None:
        df = df.filter(version_vector_filter(version_vector))
    if as_of is not None:
        df = df.filter(version_vector_ceiling(as_of))
    ns = namespace_filter(namespace)
    if ns is not None:
        df = df.filter(ns)
    if order_globally:
        # tolerate envelope frames that carry only a counter column
        order_cols = [c for c in ID_ORDER if c in df.columns]
        df = df.orderBy(*order_cols)
    if limit is not None and limit > 0:  # 0 = unlimited sentinel (A7)
        df = df.limit(int(limit))
    return df


def head_status(events: DataFrame, partition_col: str = "partition") -> DataFrame:
    """Per-partition head counters — flo's EventStreamStatus (A13,
    connection_state.rs:94-114).

    ``primary`` mirrors PartitionStatus.primary (flo-protocol/src/
    client.rs:207-221): whether this server owns writes for the
    partition.  The embedded/single-engine deployment (the only one
    the reference ships — clustering is vestigial) owns every
    partition it can read, so the flag is constantly true here."""
    return (
        events.groupBy(F.col(partition_col).alias("partition"))
        .agg(F.max("event_counter").alias("head_counter"))
        .withColumn("primary", F.lit(True))
        .orderBy("partition")
    )


def lineage_join(events: DataFrame, parents: DataFrame | None = None) -> DataFrame:
    """Left self-join on parent id — A16 (flo-event/src/lib.rs:192-196).

    Returns each event with its causal parent's namespace/timestamp.
    """
    parents = (parents or events).select(
        F.col("event_counter").alias("p_counter"),
        F.col("actor").alias("p_actor"),
        F.col("namespace").alias("parent_namespace"),
        F.col("timestamp").alias("parent_timestamp"),
    )
    return events.join(
        parents,
        (events["parent_counter"] == parents["p_counter"])
        & (events["parent_actor"] == parents["p_actor"]),
        "left",
    ).drop("p_counter", "p_actor")
