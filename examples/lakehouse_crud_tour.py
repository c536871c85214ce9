"""Lakehouse CRUD tour — the full transactional-table lifecycle on
the engine's own manifest-table primitive (sources/manifest_table.py),
the surface a warehouse user expects from Delta/Iceberg, here end to
end on one toy table:

    append (x2, streaming-sink style with an exactly-once replay
    probe) -> merge-on-read DELETE (deletion vector, no rewrite)
    -> transactional MERGE (upsert: DV + fragment in one commit)
    -> change data feed between any two versions -> incremental
    view maintenance from those deltas -> bloom + min/max data
    skipping -> OPTIMIZE (bin-packing compaction, dataChange=false)
    -> time travel proof -> snapshot expiry + vacuum

Usage:
    python examples/lakehouse_crud_tour.py [WORKDIR]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir: str) -> None:
    from pyspark.sql import functions as F

    from flo_spark.session import get_spark
    from flo_spark.sources.manifest_table import ManifestTable

    spark = get_spark("lakehouse-crud-tour")
    t = ManifestTable(os.path.join(workdir, "tbl"))

    # -- 1. ingest: one batch append + one exactly-once stream batch
    rows = spark.range(0, 8).selectExpr(
        "id AS k", "id * 100 AS v", "concat('g', cast(id % 2 AS string)) AS g"
    )
    t.append(rows, "base", stats_cols=["k"], bloom_cols=["g"])
    b0 = spark.range(8, 12).selectExpr("id AS k", "id * 100 AS v", "'g0' AS g")
    t.commit_stream_batch(b0, batch_id=0, source_id="demo")
    v_before_replay = t.current_version()
    t.commit_stream_batch(b0, batch_id=0, source_id="demo")  # crash replay
    assert t.current_version() == v_before_replay
    print(f"v{t.current_version()}: 12 rows in, replayed batch was a no-op")

    # -- 2. merge-on-read delete: addresses recorded, no data rewritten
    files_before = t.manifest()["files"]
    t.delete_where_mor(spark, "k % 5 = 3")
    assert t.manifest()["files"] == files_before
    print(
        f"v{t.current_version()}: MOR delete of k%5=3 -> "
        f"{len(t.manifest()['deletes'])} DV file(s), 0 fragments rewritten"
    )

    # -- 3. transactional MERGE: update k=2, insert k=100, atomically
    src = spark.createDataFrame(
        [(2, 9999, "g0"), (100, 1, "gX")], "k long, v long, g string"
    )
    t.merge_mor(spark, src, "k")
    print(f"v{t.current_version()}: merge upserted 2 source rows")

    # -- 4. CDF + incremental view maintenance
    base_v = 2
    view = (
        t.read(spark, base_v).groupBy("g").agg(F.sum("v").alias("sv"))
    )
    delta = t.read_changes(spark, base_v, t.current_version()).withColumn(
        "sign", F.when(F.col("_change") == "insert", 1).otherwise(-1)
    )
    dv = delta.groupBy("g").agg(F.sum(F.col("sign") * F.col("v")).alias("ds"))
    maintained = (
        view.join(dv, "g", "full_outer")
        .select(
            "g",
            (F.coalesce("sv", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("sv"),
        )
    )
    direct = t.read(spark).groupBy("g").agg(F.sum("v").alias("sv"))
    m = {r["g"]: r["sv"] for r in maintained.collect()}
    d = {r["g"]: r["sv"] for r in direct.collect()}
    assert {k: v for k, v in m.items() if v}, m
    assert all(m.get(k, 0) == v for k, v in d.items()), (m, d)
    print(f"IVM from CDF deltas == direct recompute: {d}")

    # -- 5. data skipping: bloom point probe + min/max range probe
    _, rep_bloom = t.read_point(spark, "g", "gX")
    _, rep_range = t.read_where(spark, "k", 0, 3)
    print(
        f"bloom probe g='gX' read {rep_bloom['fragments_read']}/"
        f"{rep_bloom['fragments_total']} fragments; "
        f"range probe k in [0,3] read {rep_range['fragments_read']}/"
        f"{rep_range['fragments_total']}"
    )

    # -- 6. OPTIMIZE: bin-pack the small fragments; no visible row moves
    before = sorted(r.k for r in t.read(spark).collect())
    _v, rep = t.optimize(spark, target_bytes=1 << 30)
    after = sorted(r.k for r in t.read(spark).collect())
    assert before == after
    print(
        f"v{t.current_version()}: OPTIMIZE {rep['fragments_before']} -> "
        f"{rep['fragments_after']} fragments, rows unchanged"
    )

    # -- 7. time travel still exact after everything
    assert t.read(spark, 1).count() == 8
    assert t.read(spark, 2).count() == 12
    print("time travel: v1=8 rows, v2=12 rows, still exact")

    # -- 8. retention: expire history, vacuum unreachable fragments
    t.expire_versions(keep_last=1)
    rep = t.vacuum()
    assert t.read(spark).count() == len(after)
    print(
        f"vacuum: {rep['fragments_deleted']} unreachable fragment(s) "
        f"reclaimed, head still reads {len(after)} rows"
    )
    print("lakehouse CRUD tour complete")
    spark.stop()


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    main(wd)
