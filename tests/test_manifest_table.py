"""Unit tests for the manifest-versioned lakehouse table
(sources/manifest_table.py): snapshot isolation, time travel,
copy-on-write delete selectivity, and the atomic put-if-absent
commit claim."""

import os

import pytest

from flo_spark.sources.manifest_table import CommitConflict, ManifestTable


@pytest.fixture()
def table(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.append(spark.range(0, 10).withColumnRenamed("id", "k"), "base")
    return t


def test_versions_and_time_travel(spark, table):
    t = table
    assert t.current_version() == 1
    t.append(spark.range(10, 15).withColumnRenamed("id", "k"), "more")
    t.delete_where(spark, "k % 2 = 0")
    assert t.current_version() == 3
    # v1 and v2 still read their exact original snapshots after the
    # v3 rewrite — the time-travel contract.
    assert sorted(r.k for r in t.read(spark, 1).collect()) == list(range(10))
    assert sorted(r.k for r in t.read(spark, 2).collect()) == list(range(15))
    assert sorted(r.k for r in t.read(spark, 3).collect()) == [
        1, 3, 5, 7, 9, 11, 13,
    ]
    # latest == explicit head version
    assert (
        t.read(spark).orderBy("k").collect()
        == t.read(spark, 3).orderBy("k").collect()
    )


def test_cow_rewrites_only_affected_fragments(spark, table):
    t = table
    t.append(spark.range(100, 105).withColumnRenamed("id", "k"), "more")
    before = t.manifest(2)["files"]
    t.delete_where(spark, "k >= 100")  # matches only the 'more' fragment
    after = t.manifest(3)["files"]
    # base fragment carried over BY REFERENCE, only 'more' was rewritten
    base = [f for f in before if f.endswith("base")]
    assert base and all(f in after for f in base)
    assert not any(f.endswith("more") for f in after)


def test_commit_claim_is_put_if_absent(spark, table):
    t = table
    # simulate a racing writer that claimed version 2 first
    t2 = ManifestTable(t.root)
    t2.append(spark.range(50, 52).withColumnRenamed("id", "k"), "racer")
    # a direct publish at the stale head version must CONFLICT...
    with pytest.raises(CommitConflict):
        t._publish(2, t.manifest(1)["files"], "stale")
    # ...while the optimistic commit() path retries on the winner's
    # snapshot and lands at version 3 including the racer's fragment.
    rel = t.write_fragment(
        spark.range(60, 62).withColumnRenamed("id", "k"), "late"
    )
    v = t.commit(lambda files: (files + [rel], "append"))
    assert v == 3
    ks = sorted(r.k for r in t.read(spark, 3).collect())
    assert ks == list(range(10)) + [50, 51, 60, 61]
    # no temp files leak from the conflicted attempt
    assert not [
        f for f in os.listdir(os.path.join(t.root, "manifests")) if ".tmp." in f
    ]


def test_contended_delete_where_retries(spark, table):
    # A racer lands version 2 between delete_where's snapshot read and
    # its publish; the retry must rewrite under a FRESH fragment name
    # (attempt 1's errorifexists path) instead of raising.
    t = table
    racer_done = {"flag": False}
    orig_manifest = t.manifest

    def manifest_with_race(version=None, chain="main"):
        head = orig_manifest(version, chain)
        if version is None and not racer_done["flag"]:
            racer_done["flag"] = True
            ManifestTable(t.root).append(
                spark.range(100, 103).withColumnRenamed("id", "k"), "racer"
            )
        return head

    t.manifest = manifest_with_race
    v = t.delete_where(spark, "k % 2 = 0")
    assert v == 3
    ks = sorted(r.k for r in t.read(spark, 3).collect())
    assert ks == [1, 3, 5, 7, 9, 101]
    # the winning rewrite carries the attempt-1 tag; attempt 0's orphan
    # fragment is unreferenced by any manifest.
    files = t.manifest(3)["files"]
    assert any(f.endswith("_cow.r1") for f in files)
    for ver in (1, 2, 3):
        assert not any(
            f.endswith("_cow") for f in t.manifest(ver)["files"]
        )


def test_expire_and_vacuum_reclaim_only_unreachable(spark, table):
    t = table
    t.append(spark.range(100, 105).withColumnRenamed("id", "k"), "more")
    t.delete_where(spark, "k % 2 = 0")  # rewrites both fragments
    # plant an abandoned uncommitted write (e.g. a crashed writer)
    t.write_fragment(spark.range(0, 3).withColumnRenamed("id", "k"), "junk")
    # everything still referenced -> vacuum deletes only the junk
    rep = t.vacuum()
    assert rep == {"fragments_deleted": 1, "fragments_kept": 4}
    # retention: keep only the head snapshot, then vacuum its orphans
    assert t.expire_versions(keep_last=1) == [1, 2]
    rep = t.vacuum()
    assert rep == {"fragments_deleted": 2, "fragments_kept": 2}
    # the surviving snapshot is intact after the sweep...
    ks = sorted(r.k for r in t.read(spark, 3).collect())
    assert ks == [1, 3, 5, 7, 9, 101, 103]
    # ...and expired versions are gone
    with pytest.raises(ValueError):
        t.read(spark, 1)


def test_stats_sidecar_prunes_fragments(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    for i in range(4):
        t.append(
            spark.range(i * 100, (i + 1) * 100).withColumnRenamed("id", "k"),
            f"part{i}",
            stats_cols=["k"],
        )
    # a range inside fragment 2 lists exactly ONE fragment
    df, rep = t.read_where(spark, "k", 210, 230)
    assert rep == {"fragments_total": 4, "fragments_read": 1}
    ks = sorted(r.k for r in df.collect())
    assert ks == list(range(210, 231))
    # straddling two fragments reads exactly those two
    df, rep = t.read_where(spark, "k", 95, 105)
    assert rep["fragments_read"] == 2
    assert sorted(r.k for r in df.collect()) == list(range(95, 106))
    # a fully disjoint range launches NO scan and returns empty
    df, rep = t.read_where(spark, "k", 5000, 6000)
    assert rep["fragments_read"] == 0 and df.count() == 0
    # a stats-less fragment is must-read (conservative rule)
    t.append(spark.range(900, 910).withColumnRenamed("id", "k"), "nostats")
    df, rep = t.read_where(spark, "k", 210, 230)
    assert rep == {"fragments_total": 5, "fragments_read": 2}
    assert sorted(r.k for r in df.collect()) == list(range(210, 231))


def test_delete_where_stats_prune_skips_probe(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    for i in range(3):
        t.append(
            spark.range(i * 100, (i + 1) * 100).withColumnRenamed("id", "k"),
            f"part{i}",
            stats_cols=["k"],
        )
    before = t.manifest()["files"]
    t.delete_where(spark, "k BETWEEN 150 AND 160", prune=("k", 150, 160))
    after = t.manifest()["files"]
    # fragments 0 and 2 carried over BY REFERENCE (stats-pruned, no
    # probe); only fragment 1 was rewritten
    assert sum(1 for f in before if f in after) == 2
    assert sum(1 for f in after if f.endswith("_cow")) == 1
    ks = sorted(r.k for r in t.read(spark).collect())
    assert ks == [k for k in range(300) if not (150 <= k <= 160)]


def test_empty_read_raises(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        t.read(spark)


def test_mor_delete_records_positions_not_rewrites(spark, table):
    t = table
    t.append(spark.range(10, 15).withColumnRenamed("id", "k"), "more")
    files_before = t.manifest()["files"]
    t.delete_where_mor(spark, "k % 3 = 0")
    m = t.manifest()
    # data fragments untouched — only a DV file was added
    assert m["files"] == files_before
    assert len(m["deletes"]) == 1
    assert sorted(r.k for r in t.read(spark).collect()) == [
        1, 2, 4, 5, 7, 8, 10, 11, 13, 14,
    ]
    # time travel: the pre-delete snapshot still reads everything
    assert sorted(r.k for r in t.read(spark, 2).collect()) == list(range(15))


def test_mor_deletes_stack_without_duplicate_addresses(spark, table):
    t = table
    t.delete_where_mor(spark, "k < 3")
    t.delete_where_mor(spark, "k < 6")  # overlaps the first delete
    m = t.manifest()
    assert len(m["deletes"]) == 2
    assert sorted(r.k for r in t.read(spark).collect()) == [6, 7, 8, 9]
    # second DV excludes rows the first already deleted: addresses
    # across all DV files are unique
    dv = spark.read.parquet(
        *[os.path.join(t.root, r) for r in m["deletes"]]
    )
    assert dv.count() == dv.select("file_key", "pos").distinct().count() == 6


def test_read_where_applies_deletes(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.append(
        spark.range(0, 10).withColumnRenamed("id", "k"),
        "base",
        stats_cols=["k"],
    )
    t.delete_where_mor(spark, "k = 4")
    df, rep = t.read_where(spark, "k", 0, 9)
    assert rep == {"fragments_total": 1, "fragments_read": 1}
    assert sorted(r.k for r in df.collect()) == [0, 1, 2, 3, 5, 6, 7, 8, 9]


def test_rewrite_deletes_purges_and_is_fragment_granular(spark, table):
    t = table
    t.append(spark.range(100, 105).withColumnRenamed("id", "k"), "more")
    t.delete_where_mor(spark, "k >= 100 AND k % 2 = 0")  # dirty: 'more' only
    before = t.manifest()["files"]
    t.rewrite_deletes(spark)
    m = t.manifest()
    assert m["deletes"] == []
    # clean fragment carried by reference; dirty one rewritten
    base = [f for f in before if f.endswith("base")]
    assert base and all(f in m["files"] for f in base)
    assert not any(f.endswith("more") for f in m["files"])
    assert sorted(r.k for r in t.read(spark).collect()) == [
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 101, 103,
    ]


def test_cow_after_mor_does_not_resurrect(spark, table):
    t = table
    t.delete_where_mor(spark, "k = 1")
    # COW delete touches the same fragment: the rewrite must apply the
    # pending DV, not resurrect k=1 from the raw bytes.
    t.delete_where(spark, "k = 5")
    assert sorted(r.k for r in t.read(spark).collect()) == [
        0, 2, 3, 4, 6, 7, 8, 9,
    ]


def test_vacuum_keeps_referenced_dv_files(spark, table):
    t = table
    t.delete_where_mor(spark, "k = 0")
    t.expire_versions(keep_last=1)
    rep = t.vacuum()
    assert rep["fragments_deleted"] == 0  # DV file is live data
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(1, 10))


def test_change_data_feed_rowlevel(spark, table):
    t = table
    t.append(spark.range(10, 13).withColumnRenamed("id", "k"), "more")
    t.delete_where_mor(spark, "k % 4 = 1")
    t.rewrite_deletes(spark)  # dataChange=false: must emit nothing
    ch = t.read_changes(spark, 1, 4).collect()
    ins = sorted(r.k for r in ch if r._change == "insert")
    dels = sorted(r.k for r in ch if r._change == "delete")
    assert ins == [10, 11, 12]
    assert dels == [1, 5, 9]
    assert {r._commit_version for r in ch} == {2, 3}
    # CDF replay: v1 snapshot + changes == head snapshot
    v1 = {r.k for r in t.read(spark, 1).collect()}
    head = {r.k for r in t.read(spark).collect()}
    assert (v1 | set(ins)) - set(dels) == head


def test_change_data_feed_rejects_cow(spark, table):
    t = table
    t.delete_where(spark, "k = 2")
    with pytest.raises(ValueError, match="copy-on-write"):
        t.read_changes(spark, 1, 2)


def test_stream_batch_commit_is_exactly_once(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    b0 = spark.range(0, 5).withColumnRenamed("id", "k")
    v1 = t.commit_stream_batch(b0, 0)
    assert v1 == 1 and t.manifest()["txn"] == {"stream": 0}
    # crash-replay of batch 0: must be a no-op, no new version/fragment
    v_again = t.commit_stream_batch(b0, 0)
    assert v_again == 1 and t.current_version() == 1
    t.commit_stream_batch(spark.range(5, 8).withColumnRenamed("id", "k"), 1)
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(8))
    # a later non-streaming commit carries the txn ledger forward
    t.append(spark.range(8, 9).withColumnRenamed("id", "k"), "side")
    assert t.manifest()["txn"] == {"stream": 1}
    # ...so a replay of batch 1 after that append is STILL a no-op
    t.commit_stream_batch(b0, 1)
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(9))


def test_stream_batch_two_sources_independent(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit_stream_batch(
        spark.range(0, 2).withColumnRenamed("id", "k"), 0, source_id="a"
    )
    # same batch id, different source: NOT a replay
    t.commit_stream_batch(
        spark.range(2, 4).withColumnRenamed("id", "k"), 0, source_id="b"
    )
    assert t.manifest()["txn"] == {"a": 0, "b": 0}
    assert sorted(r.k for r in t.read(spark).collect()) == [0, 1, 2, 3]


def test_merge_mor_upsert(spark, table):
    t = table
    src = spark.createDataFrame(
        [(2, "upd2"), (4, "upd4"), (100, "new")], "k long, tag string"
    )
    tgt_tagged = spark.range(0, 10).selectExpr("id as k", "'base' as tag")
    t2 = ManifestTable(str(t.root) + "_tagged")
    t2.append(tgt_tagged, "base")
    t2.merge_mor(spark, src, "k")
    m = t2.manifest()
    assert m["op"] == "merge" and len(m["deletes"]) == 1
    rows = {(r.k, r.tag) for r in t2.read(spark).collect()}
    assert rows == {(k, "base") for k in (0, 1, 3, 5, 6, 7, 8, 9)} | {
        (2, "upd2"), (4, "upd4"), (100, "new"),
    }
    # time travel: pre-merge snapshot intact
    assert {r.tag for r in t2.read(spark, 1).collect()} == {"base"}
    # CDF of the merge: matched pre-images as deletes, source as inserts
    ch = t2.read_changes(spark, 1, 2).collect()
    assert sorted((r.k, r._change) for r in ch) == [
        (2, "delete"), (2, "insert"), (4, "delete"), (4, "insert"),
        (100, "insert"),
    ]


def test_merge_mor_then_purge(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.append(spark.range(0, 6).selectExpr("id as k", "id * 10 as v"), "base")
    t.merge_mor(
        spark, spark.createDataFrame([(1, 999), (7, 700)], "k long, v long"), "k"
    )
    t.rewrite_deletes(spark)
    assert t.manifest()["deletes"] == []
    assert sorted((r.k, r.v) for r in t.read(spark).collect()) == [
        (0, 0), (1, 999), (2, 20), (3, 30), (4, 40), (5, 50), (7, 700),
    ]


def test_bloom_point_lookup_prunes_and_is_lossless(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    for i in range(4):
        t.append(
            spark.range(i * 10, i * 10 + 10).selectExpr(
                "id as k", f"concat('g', cast(id % 40 div 10 as string)) as g"
            ),
            f"shard{i}",
            bloom_cols=["g"],
        )
    df, rep = t.read_point(spark, "g", "g2")
    assert rep["fragments_total"] == 4
    assert rep["fragments_read"] == 1  # bloom pruned 3 of 4
    assert sorted(r.k for r in df.collect()) == list(range(20, 30))
    # absent value: zero fragments opened, empty exact result
    df0, rep0 = t.read_point(spark, "g", "nope")
    assert rep0["fragments_read"] == 0 and df0.count() == 0
    # fragment without a bloom is must-read (conservative)
    t.append(spark.range(100, 101).selectExpr("id as k", "'g2' as g"), "nb")
    df2, rep2 = t.read_point(spark, "g", "g2")
    assert rep2["fragments_read"] == 2
    assert sorted(r.k for r in df2.collect()) == list(range(20, 30)) + [100]


def test_bloom_respects_deletes(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.append(
        spark.range(0, 10).selectExpr("id as k", "'a' as g"),
        "base",
        bloom_cols=["g"],
    )
    t.delete_where_mor(spark, "k = 3")
    df, _ = t.read_point(spark, "g", "a")
    assert sorted(r.k for r in df.collect()) == [0, 1, 2, 4, 5, 6, 7, 8, 9]


def test_ffd_bin_packing_deterministic():
    sizes = {"a": 70, "b": 50, "c": 40, "d": 30, "e": 200}
    bins = ManifestTable._first_fit_decreasing(sizes, 100)
    # e >= target: own bin, never rewritten; 70+30, 50+40 pack
    assert sorted(sorted(b) for b in bins) == [["a", "d"], ["b", "c"], ["e"]]


def test_optimize_compacts_and_changes_no_row(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    for i in range(6):
        t.append(
            spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "k")
            .coalesce(1),
            f"s{i}",
        )
    t.delete_where_mor(spark, "k % 10 = 9")
    v, rep = t.optimize(spark, target_bytes=1 << 30)
    assert rep["fragments_before"] == 6 and rep["fragments_after"] == 1
    assert sorted(r.k for r in t.read(spark).collect()) == [
        k for k in range(60) if k % 10 != 9
    ]
    # time travel intact, and the optimize commit emits no CDF rows
    assert t.read(spark, 6).count() == 60
    ch = t.read_changes(spark, 6, v)
    assert sorted(r.k for r in ch.collect()) == [9, 19, 29, 39, 49, 59]
    assert {r._commit_version for r in ch.collect()} == {7}  # only the delete


def test_write_audit_publish_branch(spark, table):
    t = table
    t.create_branch("stage")
    # staged append is invisible to main until publish
    t.append(
        spark.range(100, 105).withColumnRenamed("id", "k"),
        "staged",
        chain="stage",
    )
    assert t.read(spark).count() == 10
    assert t.read(spark, chain="stage").count() == 15
    v_main_before = t.current_version()
    # audit passes -> publish fast-forwards main in ONE commit
    t.publish_branch(spark, "stage")
    assert t.current_version() == v_main_before + 1
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(10)) + [
        100, 101, 102, 103, 104,
    ]
    assert t.manifest()["op"] == "publish"


def test_abandoned_branch_fragments_vacuum_after_drop(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    t.append(spark.range(0, 4).withColumnRenamed("id", "k"), "base")
    t.create_branch("bad")
    t.append(
        spark.range(90, 95).withColumnRenamed("id", "k"), "dirty", chain="bad"
    )
    # while the branch exists its fragments are protected from vacuum
    rep = t.vacuum()
    assert rep["fragments_deleted"] == 0
    t.drop_branch("bad")
    rep = t.vacuum()
    assert rep["fragments_deleted"] == 1  # the abandoned dirty fragment
    assert t.read(spark).count() == 4


def test_create_branch_rejects_existing(spark, table):
    t = table
    t.create_branch("x")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("x")
    t.drop_branch("x")
    t.create_branch("x")  # fine after drop
