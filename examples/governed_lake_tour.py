"""Data-governance tour — the lifecycle operations a governed lake
needs, on this engine's own primitives:

    maintain a live view INCREMENTALLY with retractions (signed
    deltas, replay-safe shards) -> evolve the table schema without
    rewriting history (mergeSchema) -> forget a subject the
    append-only way (tombstone + compaction = PHYSICAL erasure,
    original ids preserved as gaps)

Usage:
    python examples/governed_lake_tour.py [WORKDIR]
"""

import os
import sys
import tempfile
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir: str) -> None:
    from pyspark.sql import functions as F

    import flo_spark as fs
    from flo_spark.operators.produce import assign_event_ids
    from flo_spark.sources.flo_segment import (
        read_flo_segments,
        write_flo_segments,
    )

    spark = fs.get_spark("governed-lake-tour")

    # -- 1. Incremental view maintenance with retractions -----------------
    # Three change batches: inserts (+value) and retractions (-value).
    # Each batch folds to signed per-user partials in its OWN shard;
    # the live view is the additive merge.  Replay = overwrite, never
    # double-count; the view can go DOWN (the thing append-only
    # monitors cannot do).
    store = os.path.join(workdir, "ivm_store")
    batches = [
        [(1, +1, 100_0000), (2, +1, 250_0000)],           # inserts
        [(1, +1, 40_0000), (2, -1, 250_0000)],            # 2 retracts
        [(3, +1, 75_0000), (1, -1, 100_0000)],            # mixed
    ]
    for bid, rows in enumerate(batches):
        (
            spark.createDataFrame(
                rows, "user_id long, sgn int, cents long"
            )
            .groupBy("user_id")
            .agg(
                F.sum("sgn").alias("d_rows"),
                F.sum(F.col("sgn") * F.col("cents")).alias("d_cents"),
            )
            .write.mode("overwrite")
            .parquet(f"{store}/batch={bid}")
        )
    view = (
        spark.read.parquet(f"{store}/batch=*")
        .groupBy("user_id")
        .agg(
            F.sum("d_rows").alias("net_rows"),
            F.sum("d_cents").alias("net_cents"),
        )
        .orderBy("user_id")
    )
    print("== live IVM view (user 2 fully retracted -> net 0) ==")
    view.show()

    # -- 2. Schema evolution without rewriting history --------------------
    tbl = os.path.join(workdir, "tbl")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, text string"
    ).write.mode("overwrite").parquet(f"{tbl}/gen=1")
    spark.createDataFrame(
        [(3, "gamma", "en", 5)], "id long, text string, lang string, n int"
    ).write.mode("overwrite").parquet(f"{tbl}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(tbl)
    print("== mergeSchema scan: old files surface new columns as NULL ==")
    merged.orderBy("id").show()

    # -- 3. Right-to-be-forgotten on the append-only store ----------------
    base = spark.createDataFrame(
        [
            (o, 1, f"/users/{u}/docs", d, None, None,
             datetime(2024, 1, 1, 0, 0, o, tzinfo=timezone.utc))
            for o, u, d in [
                (1, 1, b"keep-me"),
                (2, 3, b"FORGET-ME"),
                (3, 2, b"keep-too"),
            ]
        ]
        + [(9, 1, "/system/tombstones/3", None, None, None,
            datetime(2024, 1, 1, 0, 1, tzinfo=timezone.utc))],
        "ord long, partition int, namespace string, data binary, "
        "parent_counter long, parent_actor int, timestamp timestamp",
    )
    env = assign_event_ids(base, 0, order_by="ord").drop("ord")
    raw = os.path.join(workdir, "raw")
    compacted = os.path.join(workdir, "compacted")
    write_flo_segments(env, raw, max_events_per_segment=2)

    ev = read_flo_segments(spark, raw)
    forgotten = (
        ev.filter(F.col("namespace").startswith("/system/tombstones/"))
        .select(F.element_at(F.split("namespace", "/"), 4).alias("uid"))
        .distinct()
    )
    keep = (
        ev.filter(~F.col("namespace").startswith("/system/tombstones/"))
        .withColumn("uid", F.element_at(F.split("namespace", "/"), 3))
        .join(forgotten, "uid", "left_anti")
    )
    write_flo_segments(keep.drop("uid"), compacted, max_events_per_segment=2)

    blob = b""
    for root, _, files in os.walk(compacted):
        for fn in files:
            if fn.endswith(".events"):
                blob += open(os.path.join(root, fn), "rb").read()
    assert b"FORGET-ME" not in blob, "erasure must be physical"
    print("== compacted store: subject physically erased, ids keep gaps ==")
    read_flo_segments(spark, compacted).select(
        "event_counter", "namespace"
    ).orderBy("event_counter").show(truncate=False)

    spark.stop()
    print("governed-lake tour complete")


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    main(wd)
