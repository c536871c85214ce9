"""Manifest-versioned parquet table — snapshot isolation + time travel.

The lakehouse commit protocol (the shape Iceberg/Delta implement, here
as the minimal correct core): a table is a directory with

* ``data/`` — immutable parquet fragments (each one Spark write),
* ``manifests/v{N}.json`` — version N's snapshot: the list of data
  fragments that ARE the table at version N, plus commit metadata.

A commit never mutates data in place.  It writes new fragments, then
publishes a new manifest; readers resolve a version (default: latest)
to its fragment list and scan exactly those files.  Appends add
fragments; deletes/updates are copy-on-write (rewrite the affected
fragment without the removed rows and publish a manifest that swaps
it).  Old versions keep reading their exact original snapshot —
time travel — until a retention sweep removes unreferenced fragments.

Atomicity + optimistic concurrency: the manifest is staged to a temp
file and CLAIMED with ``os.link`` (hard link), which fails with
``FileExistsError`` if version N already exists — the POSIX
equivalent of the atomic put-if-absent every lakehouse commit
protocol needs.  A losing writer re-reads the head and retries on top
of the winner (``commit`` takes a ``build`` callback for exactly
that).  No partial state is ever visible: a reader either sees
``v{N}.json`` complete or not at all.

Scale note: manifests hold file paths, not data — O(fragments)
driver-side metadata, exactly what table formats ship.  Fragment
scans stay fully distributed; version resolution is one small JSON
read.

Reference scope: flo's append-only segment store (persistent_event.rs)
has no snapshot isolation; this is a north-star extension (SURVEY §2
Part B sources/sinks).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["ManifestTable", "CommitConflict"]


class CommitConflict(RuntimeError):
    """Another writer claimed the version this commit targeted."""


class ManifestTable:
    def __init__(self, root: str):
        self.root = root
        self._data = os.path.join(root, "data")
        self._manifests = os.path.join(root, "manifests")
        os.makedirs(self._data, exist_ok=True)
        os.makedirs(self._manifests, exist_ok=True)

    # -- metadata ----------------------------------------------------------

    @staticmethod
    def _chain_prefix(chain: str) -> str:
        """Manifest filename prefix for a version chain: the main
        chain is ``v``; a branch ``x`` is ``b-x-v`` (the
        write-audit-publish staging lines, Iceberg/Nessie-style)."""
        return "v" if chain == "main" else f"b-{chain}-v"

    def current_version(self, chain: str = "main") -> int:
        """Highest committed version on ``chain``, 0 if none.
        O(manifests) listing."""
        best = 0
        pre = self._chain_prefix(chain)
        for name in os.listdir(self._manifests):
            if name.startswith(pre) and name.endswith(".json"):
                try:
                    best = max(best, int(name[len(pre):-5]))
                except ValueError:
                    continue
        return best

    def _manifest_path(self, version: int, chain: str = "main") -> str:
        return os.path.join(
            self._manifests, f"{self._chain_prefix(chain)}{version}.json"
        )

    def manifest(
        self, version: int | None = None, chain: str = "main"
    ) -> dict:
        v = self.current_version(chain) if version is None else version
        path = self._manifest_path(v, chain)
        if v == 0 or not os.path.exists(path):
            return {"version": 0, "files": [], "op": "init"}
        with open(path) as fh:
            return json.load(fh)

    # -- write path --------------------------------------------------------

    #: bloom sidecar geometry: 4096-bit / 3-hash keeps the sidecar a
    #: few KB while point-probe false positives stay ~(bits_set/m)^k.
    BLOOM_M = 4096
    BLOOM_K = 3

    def write_fragment(
        self,
        df: DataFrame,
        name: str,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> str:
        """Materialize one immutable data fragment; returns its relative
        path.  Fragments are directories (one Spark parquet write), the
        same unit table formats track per commit.

        With ``stats_cols``, per-column min/max land in a ``_stats.json``
        sidecar INSIDE the fragment dir — immutable with the fragment, so
        the manifest format stays a plain path list and losing-attempt
        orphans carry their stats to the vacuum.  Readers prune at
        FRAGMENT granularity from one tiny JSON per fragment
        (:meth:`read_where`) — the file-level data skipping every table
        format keys scans on, without opening parquet footers
        driver-side."""
        rel = os.path.join("data", name)
        df.write.mode("errorifexists").parquet(os.path.join(self.root, rel))
        if stats_cols:
            from pyspark.sql import functions as _F

            aggs = []
            for c in stats_cols:
                aggs.append(_F.min(c).alias(f"min_{c}"))
                aggs.append(_F.max(c).alias(f"max_{c}"))
            row = df.agg(*aggs).collect()[0]  # O(1) driver metadata
            stats = {
                c: [row[f"min_{c}"], row[f"max_{c}"]] for c in stats_cols
            }
            with open(
                os.path.join(self.root, rel, "_stats.json"), "w"
            ) as fh:
                json.dump(stats, fh, default=str)
        if bloom_cols:
            from pyspark.sql import functions as _F

            bloom: dict[str, dict] = {}
            for c in bloom_cols:
                pos = _F.explode(
                    _F.array(
                        *[
                            _F.pmod(
                                _F.xxhash64(_F.col(c), _F.lit(i)),
                                _F.lit(self.BLOOM_M),
                            )
                            for i in range(self.BLOOM_K)
                        ]
                    )
                )
                # O(BLOOM_M)-bounded driver metadata: distinct bit
                # positions, never values.
                rows = df.select(pos.alias("p")).distinct().collect()
                bloom[c] = {
                    "m": self.BLOOM_M,
                    "k": self.BLOOM_K,
                    "bits": sorted(int(r["p"]) for r in rows),
                }
            with open(
                os.path.join(self.root, rel, "_bloom.json"), "w"
            ) as fh:
                json.dump(bloom, fh)
        return rel

    def fragment_bloom(self, rel: str) -> dict | None:
        """Per-column bloom bit sets recorded at write time, None if
        the fragment was written without ``bloom_cols``."""
        path = os.path.join(self.root, rel, "_bloom.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def read_point(
        self,
        spark: SparkSession,
        col: str,
        value,
        version: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Bloom-pruned POINT lookup (the Iceberg/Parquet bloom-sidecar
        skipping for equality predicates, where min/max stats can't
        help — high-cardinality or categorical keys): a fragment is
        read only if ALL k probe positions of ``value`` are set in its
        recorded bloom bits.  No false negatives by construction (every
        written value set its bits), so the prune is lossless; false
        positives only cost an extra fragment scan.  Fragments written
        without a bloom for ``col`` are must-read (conservative rule,
        as in :meth:`read_where`).

        Returns ``(df, report)`` — df carries the exact residual
        ``col = value`` filter; report counts fragments.  100 TB
        shape: the probe is O(1) driver work (one k-position hash) +
        O(fragments) sidecar reads; unpruned engines scan the fleet
        for one key."""
        from pyspark.sql import functions as _F

        m = self.manifest(version)
        if not m["files"]:
            raise ValueError(f"version {m['version']} is empty")
        # probe positions via the SAME engine hash as the write side
        # (one 1-row collect: O(1) driver metadata)
        probe_row = spark.range(1).select(
            _F.array(
                *[
                    _F.pmod(
                        _F.xxhash64(_F.lit(value), _F.lit(i)),
                        _F.lit(self.BLOOM_M),
                    )
                    for i in range(self.BLOOM_K)
                ]
            ).alias("ps")
        ).collect()
        probes = set(probe_row[0]["ps"])
        keep: list[str] = []
        for rel in m["files"]:
            bl = self.fragment_bloom(rel)
            ent = None if bl is None else bl.get(col)
            if ent is None or probes <= set(ent["bits"]):
                keep.append(rel)
        report = {
            "fragments_total": len(m["files"]),
            "fragments_read": len(keep),
        }
        if not keep:
            base = self.read(spark, version).filter(_F.lit(False))
            return base.filter(_F.col(col) == _F.lit(value)), report
        df = self._apply_deletes(
            spark,
            spark.read.parquet(
                *[os.path.join(self.root, rel) for rel in keep]
            ),
            m.get("deletes", []),
        )
        return df.filter(_F.col(col) == _F.lit(value)), report

    def fragment_stats(self, rel: str) -> dict | None:
        """Per-column [min, max] recorded at write time, None if the
        fragment was written without ``stats_cols``."""
        path = os.path.join(self.root, rel, "_stats.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def _publish(
        self,
        version: int,
        files: list[str],
        op: str,
        deletes: list[str] | None = None,
        txn: dict | None = None,
        chain: str = "main",
    ) -> int:
        body = {
            "version": version,
            "files": sorted(files),
            # position-delete files (merge-on-read deletion vectors);
            # absent/[] on COW-only tables, so old manifests stay valid.
            "deletes": sorted(deletes or []),
            # per-source last-committed streaming batch id (the Delta
            # `txn` action): the exactly-once ledger for stream sinks.
            "txn": dict(txn or {}),
            "op": op,
            # wall time is commit METADATA only — never part of query
            # results, so determinism of reads is unaffected.
            "committed_at": time.time(),
        }
        tmp = self._manifest_path(version, chain) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(body, fh)
        try:
            # atomic put-if-absent: the one writer whose link lands owns
            # version N; everyone else gets CommitConflict and retries.
            os.link(tmp, self._manifest_path(version, chain))
        except FileExistsError as exc:
            raise CommitConflict(f"version {version} already committed") from exc
        finally:
            os.unlink(tmp)
        return version

    def commit(
        self,
        build: Callable[[list[str]], tuple],
        retries: int = 10,
        chain: str = "main",
    ) -> int:
        """Optimistic commit: ``build(current_files) -> (new_files, op)``
        or ``(new_files, op, new_deletes)`` runs against the head
        snapshot; on a version collision the head is re-read and
        ``build`` re-runs on the winner's snapshot.  A 2-tuple return
        CARRIES the head's delete files forward unchanged (an append
        must not resurrect merge-on-read-deleted rows)."""
        for _ in range(retries + 1):
            head = self.manifest(chain=chain)
            out = build(list(head["files"]))
            if len(out) == 2:
                files, op = out
                deletes = list(head.get("deletes", []))
            else:
                files, op, deletes = out
            try:
                # txn always carries forward: batch-level appends/deletes
                # never regress the streaming exactly-once ledger.
                return self._publish(
                    head["version"] + 1,
                    files,
                    op,
                    deletes,
                    head.get("txn", {}),
                    chain,
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {retries} retries")

    def commit_stream_batch(
        self,
        df: DataFrame,
        batch_id: int,
        source_id: str = "stream",
        retries: int = 10,
    ) -> int:
        """Exactly-once streaming append (the Delta streaming-sink
        idempotent-txn protocol, for use inside ``foreachBatch``): the
        manifest's ``txn`` map records the last batch id committed per
        ``source_id``; a REPLAYED batch (crash between data write and
        checkpoint commit, so Structured Streaming re-delivers it) sees
        ``txn[source_id] >= batch_id`` and returns without writing —
        the rows land exactly once no matter how many times the batch
        re-runs.  The check and the publish race safely: the check
        re-runs against the fresh head on every optimistic-retry
        attempt, and the publish is the atomic put-if-absent claim.

        Crash orphans (fragment written, manifest never claimed) are
        unreferenced and vacuum-reclaimable; the re-delivered batch
        writes a fresh attempt-unique fragment rather than touching
        the orphan."""
        attempt = 0
        while True:
            head = self.manifest()
            txn = dict(head.get("txn", {}))
            if txn.get(source_id, -1) >= batch_id:
                return head["version"]  # replayed batch: already in
            if attempt > retries:
                raise CommitConflict(f"gave up after {retries} retries")
            # pid+attempt keeps the name unique across in-process
            # retries AND across a crashed prior process's orphan.
            rel = self.write_fragment(
                df, f"{source_id}_b{batch_id}.{os.getpid()}.{attempt}"
            )
            attempt += 1
            txn[source_id] = batch_id
            try:
                return self._publish(
                    head["version"] + 1,
                    head["files"] + [rel],
                    "stream-append",
                    head.get("deletes", []),
                    txn,
                )
            except CommitConflict:
                continue

    def append(
        self,
        df: DataFrame,
        name: str,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        chain: str = "main",
    ) -> int:
        rel = self.write_fragment(df, name, stats_cols, bloom_cols)
        return self.commit(
            lambda files: (files + [rel], "append"), chain=chain
        )

    def delete_where(
        self,
        spark: SparkSession,
        predicate: str,
        name_suffix: str = "cow",
        prune: tuple[str, object, object] | None = None,
    ) -> int:
        """Copy-on-write delete: every fragment containing matching rows
        is rewritten without them; untouched fragments carry over by
        reference (the Iceberg/Delta COW rule — at 100 TB only the
        affected fragments rewrite, driven by file-level stats).

        ``prune=(col, lo, hi)`` declares that the predicate can only
        match rows with ``lo <= col <= hi`` (caller's contract):
        fragments whose recorded stats miss that range carry over by
        reference WITHOUT even the match-probe scan — the stats-driven
        rewrite-set pruning named above, now actual.  Stats-less
        fragments still probe (conservative rule)."""
        # commit() re-runs build on CommitConflict; fragment names must be
        # unique PER ATTEMPT or the errorifexists write of attempt 2 hits
        # attempt 1's path and raises instead of retrying.  Attempt 0 keeps
        # the bare suffix; orphans from losing attempts are unreferenced by
        # any manifest and reclaimable by vacuum.
        attempt = 0

        def build(files: list[str]) -> tuple[list[str], str]:
            nonlocal attempt
            pending = self.manifest().get("deletes", [])
            tag = name_suffix if attempt == 0 else f"{name_suffix}.r{attempt}"
            attempt += 1
            kept: list[str] = []
            for rel in files:
                if prune is not None:
                    st = self.fragment_stats(rel)
                    rng = None if st is None else st.get(prune[0])
                    if rng is not None and (
                        rng[1] < prune[1] or rng[0] > prune[2]
                    ):
                        kept.append(rel)  # stats prove no match: no scan
                        continue
                # apply pending merge-on-read deletes first: a COW
                # rewrite of the raw bytes would RESURRECT DV-deleted
                # rows under the new fragment's file keys.
                frag = self._apply_deletes(
                    spark,
                    spark.read.parquet(os.path.join(self.root, rel)),
                    pending,
                )
                n_match = frag.filter(predicate).limit(1).count()
                if n_match == 0:
                    kept.append(rel)
                    continue
                base = os.path.basename(rel.rstrip("/"))
                new_rel = self.write_fragment(
                    frag.filter(f"NOT ({predicate})"), f"{base}_{tag}"
                )
                kept.append(new_rel)
            return kept, "delete"

        return self.commit(build)

    # -- maintenance -------------------------------------------------------

    def expire_versions(self, keep_last: int = 1) -> list[int]:
        """Drop manifests older than the newest ``keep_last`` versions
        (the snapshot-retention sweep every table format runs); returns
        the expired version numbers.  Time travel to an expired version
        is gone; fragments exclusive to expired versions become
        :meth:`vacuum`-eligible orphans.  Metadata-only — no data file
        is touched here."""
        head = self.current_version()
        expired = []
        for name in os.listdir(self._manifests):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    v = int(name[1:-5])
                except ValueError:
                    continue
                if v <= head - keep_last:
                    os.remove(os.path.join(self._manifests, name))
                    expired.append(v)
        return sorted(expired)

    def vacuum(self) -> dict:
        """Delete data fragments referenced by NO remaining manifest:
        losing-attempt orphans from optimistic retries (see
        :meth:`delete_where`), abandoned uncommitted writes, and
        fragments exclusive to :meth:`expire_versions`-dropped
        snapshots.  Returns ``{"fragments_deleted": n,
        "fragments_kept": m}``.

        Safety: the reference set is recomputed from the manifests at
        call time, so a fragment is removed only when no committed
        version can reach it.  Driver work is O(fragments) metadata —
        the same shape as Delta VACUUM / Iceberg remove_orphan_files."""
        import shutil

        referenced: set[str] = set()
        for name in os.listdir(self._manifests):
            # main chain (v*) AND every branch chain (b-*): a staged
            # write-audit-publish branch's fragments are live data.
            if (
                name.startswith("v") or name.startswith("b-")
            ) and name.endswith(".json"):
                with open(os.path.join(self._manifests, name)) as fh:
                    body = json.load(fh)
                referenced.update(body["files"])
                # position-delete files are live data too: vacuuming a
                # DV a manifest still references would resurrect rows.
                referenced.update(body.get("deletes", []))
        report = {"fragments_deleted": 0, "fragments_kept": 0}
        for frag in sorted(os.listdir(self._data)):
            if os.path.join("data", frag) in referenced:
                report["fragments_kept"] += 1
            else:
                shutil.rmtree(
                    os.path.join(self._data, frag), ignore_errors=True
                )
                report["fragments_deleted"] += 1
        return report

    # -- read path ---------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        chain: str = "main",
    ) -> DataFrame:
        """Snapshot read at ``version`` (default: latest) on
        ``chain`` (default: main)."""
        m = self.manifest(version, chain)
        if not m["files"]:
            raise ValueError(f"version {m['version']} is empty")
        paths = [os.path.join(self.root, rel) for rel in m["files"]]
        return self._apply_deletes(
            spark, spark.read.parquet(*paths), m.get("deletes", [])
        )

    # -- merge-on-read deletion vectors ------------------------------------

    @staticmethod
    def _file_key():
        """Stable per-row physical address: ``frag_dir/part_file`` (the
        last two path components — fragment names are unique within a
        table, part names within a fragment), paired with the parquet
        row index.  Relocation-safe: survives moving the table root."""
        from pyspark.sql import functions as _F

        return _F.substring_index(_F.col("_metadata.file_path"), "/", -2)

    def _apply_deletes(
        self, spark: SparkSession, df: DataFrame, delete_rels: list[str]
    ) -> DataFrame:
        """Anti-join ``df`` (a direct parquet scan, so ``_metadata`` is
        in scope) against the accumulated position-delete files.  The
        DV side is tiny relative to data (it holds only deleted-row
        addresses), so AQE broadcasts it — per-row filtering with no
        data-side shuffle, the same cost shape as Delta DV / Iceberg
        positional-delete application."""
        if not delete_rels:
            return df
        from pyspark.sql import functions as _F

        dv = spark.read.parquet(
            *[os.path.join(self.root, r) for r in delete_rels]
        ).select("file_key", "pos")
        keyed = df.withColumn("__fk", self._file_key()).withColumn(
            "__pos", _F.col("_metadata.row_index")
        )
        return (
            keyed.join(
                dv,
                (keyed["__fk"] == dv["file_key"])
                & (keyed["__pos"] == dv["pos"]),
                "left_anti",
            )
            .drop("__fk", "__pos")
        )

    def delete_where_mor(
        self, spark: SparkSession, predicate: str, name_suffix: str = "dv"
    ) -> int:
        """Merge-on-read delete: instead of rewriting fragments
        (:meth:`delete_where`), record the ADDRESSES of matching rows —
        ``(file_key, pos)`` position deletes, the Iceberg v2
        positional-delete / Delta deletion-vector design — in a small
        parquet file and publish a manifest referencing it.  Data
        fragments are untouched; readers anti-join the DV at scan time.

        Write cost is O(deleted rows), not O(affected fragments) — the
        right trade for frequent small deletes (GDPR erasure trickle,
        CDC tombstones) at 100 TB, where COW would rewrite terabytes to
        drop kilobytes.  Read cost grows with accumulated DVs;
        :meth:`rewrite_deletes` folds them back to zero.  Deletes
        stack: a second MOR delete appends another DV file, and rows
        already deleted are excluded from the new DV (the scan below
        applies pending deletes first), so DV files never hold
        duplicate addresses."""
        from pyspark.sql import functions as _F

        attempt = 0

        def build(files: list[str]) -> tuple[list[str], str, list[str]]:
            nonlocal attempt
            head = self.manifest()
            # unique per target version AND per optimistic-retry attempt
            # (write_fragment is errorifexists; see delete_where).
            tag = f"{name_suffix}.v{head['version'] + 1}" + (
                "" if attempt == 0 else f".r{attempt}"
            )
            attempt += 1
            # key rows BEFORE any join: `_metadata` resolves only on
            # the direct file-scan relation, not through join output.
            keyed = (
                spark.read.parquet(
                    *[os.path.join(self.root, r) for r in files]
                )
                .withColumn("__fk", self._file_key())
                .withColumn("__pos", _F.col("_metadata.row_index"))
            )
            pending = head.get("deletes", [])
            if pending:
                old = spark.read.parquet(
                    *[os.path.join(self.root, r) for r in pending]
                ).select("file_key", "pos")
                keyed = keyed.join(
                    old,
                    (keyed["__fk"] == old["file_key"])
                    & (keyed["__pos"] == old["pos"]),
                    "left_anti",
                )
            dv = (
                keyed.filter(predicate)
                .select(
                    _F.col("__fk").alias("file_key"),
                    _F.col("__pos").alias("pos"),
                )
                .coalesce(1)
            )
            # no leading underscore: Spark's file index treats _-prefixed
            # paths as hidden and silently ignores them on read.
            rel = self.write_fragment(dv, f"dv.{tag}")
            return files, "delete-mor", head.get("deletes", []) + [rel]

        return self.commit(build)

    @staticmethod
    def _first_fit_decreasing(
        sizes: dict[str, int], target: int
    ) -> list[list[str]]:
        """Bin-pack fragments into <= target-byte bins, largest first
        (the classic FFD heuristic every OPTIMIZE implementation
        uses).  Fragments already >= target get their own bin and are
        never rewritten.  Deterministic: size-desc then name order."""
        bins: list[tuple[int, list[str]]] = []
        for rel in sorted(sizes, key=lambda r: (-sizes[r], r)):
            sz = sizes[rel]
            if sz >= target:
                bins.append((sz, [rel]))
                continue
            for i, (used, members) in enumerate(bins):
                if used + sz <= target and used < target:
                    bins[i] = (used + sz, members + [rel])
                    break
            else:
                bins.append((sz, [rel]))
        return [members for _, members in bins]

    def fragment_bytes(self, rel: str) -> int:
        """On-disk bytes of one fragment dir (parquet parts +
        sidecars) — O(files in fragment) driver metadata."""
        total = 0
        for dirpath, _dirs, files in os.walk(os.path.join(self.root, rel)):
            for f in files:
                total += os.path.getsize(os.path.join(dirpath, f))
        return total

    def optimize(
        self,
        spark: SparkSession,
        target_bytes: int = 128 * 1024 * 1024,
        name_suffix: str = "opt",
    ) -> tuple[int, dict]:
        """Small-file compaction (the Delta OPTIMIZE / Iceberg
        rewrite_data_files maintenance op): fragments below
        ``target_bytes`` bin-pack (first-fit decreasing) and each
        multi-fragment bin rewrites into ONE fragment; bins of one
        carry over by reference, so a table that is already compact
        is a no-op commit.  Pending deletion vectors are APPLIED to
        rewritten bins (their rows get new addresses, so the stale DV
        entries can't re-match) and carried for untouched fragments.
        Publishes op ``optimize`` — a dataChange=false commit that
        :meth:`read_changes` skips, like purge.

        Returns ``(version, report)`` with before/after fragment
        counts.  100 TB shape: the packing decision is O(fragments)
        driver metadata (manifest + file sizes); only small files are
        read, each bin writes once — exactly the maintenance cost
        model table formats ship."""
        attempt = 0
        report: dict = {}

        def build(files: list[str]) -> tuple[list[str], str]:
            nonlocal attempt
            head = self.manifest()
            pending = head.get("deletes", [])
            tag = f"{name_suffix}.v{head['version'] + 1}" + (
                "" if attempt == 0 else f".r{attempt}"
            )
            attempt += 1
            sizes = {rel: self.fragment_bytes(rel) for rel in files}
            bins = self._first_fit_decreasing(sizes, target_bytes)
            kept: list[str] = []
            n_rewritten = 0
            for i, members in enumerate(sorted(bins)):
                if len(members) == 1:
                    kept.append(members[0])
                    continue
                df = self._apply_deletes(
                    spark,
                    spark.read.parquet(
                        *[os.path.join(self.root, r) for r in members]
                    ),
                    pending,
                ).coalesce(1)
                kept.append(self.write_fragment(df, f"bin{i}_{tag}"))
                n_rewritten += len(members)
            report.update(
                {
                    "fragments_before": len(files),
                    "fragments_after": len(kept),
                    "fragments_rewritten": n_rewritten,
                }
            )
            return kept, "optimize"

        v = self.commit(build)
        return v, report

    # -- write-audit-publish branches --------------------------------------

    def create_branch(self, name: str) -> int:
        """Start a staging branch at the CURRENT main head (the
        Iceberg WAP / Nessie branch shape): branch commits are
        invisible to main readers until :meth:`publish_branch`
        fast-forwards main to the audited branch head.  Branch names
        share the manifest dir under a ``b-<name>-v`` prefix; all
        chain operations (append/read/commit) take ``chain=name``."""
        if name == "main" or "-" in name:
            raise ValueError("branch names must not be 'main' or contain '-'")
        if self.current_version(chain=name) > 0:
            raise ValueError(
                f"branch {name!r} already exists; drop_branch it first"
            )
        head = self.manifest()

        def build(_files: list[str]) -> tuple[list[str], str, list[str]]:
            return list(head["files"]), "branch", list(head.get("deletes", []))

        return self.commit(build, chain=name)

    def publish_branch(self, spark_or_none, name: str) -> int:
        """Atomically fast-forward main to the branch head (the
        PUBLISH step of write-audit-publish: the audited state
        becomes visible to every main reader in ONE commit; main
        history gains a single ``publish`` version regardless of how
        many staging commits the branch took).  The argument order
        keeps room for a future audit callback; the first parameter
        is unused today."""
        head_b = self.manifest(chain=name)
        if head_b["version"] == 0:
            raise ValueError(f"branch {name!r} has no commits")

        def build(_files: list[str]) -> tuple[list[str], str, list[str]]:
            return (
                list(head_b["files"]),
                "publish",
                list(head_b.get("deletes", [])),
            )

        return self.commit(build)

    def drop_branch(self, name: str) -> int:
        """Delete a branch's manifests (abandoning its staged state);
        its exclusive fragments become vacuum-reclaimable orphans.
        Returns the number of manifests removed."""
        pre = self._chain_prefix(name)
        n = 0
        for fname in os.listdir(self._manifests):
            if fname.startswith(pre) and fname.endswith(".json"):
                os.remove(os.path.join(self._manifests, fname))
                n += 1
        return n

    def merge_mor(
        self,
        spark: SparkSession,
        source: DataFrame,
        key: str,
        name_suffix: str = "merge",
    ) -> int:
        """Transactional UPSERT, merge-on-read (the Hudi MOR / Delta
        DV-backed ``MERGE INTO`` shape): target rows whose ``key``
        appears in ``source`` are deleted by ADDRESS (a new position-
        delete file), and ALL source rows (updates + inserts alike)
        land as one appended fragment — published together in a single
        atomic commit (op ``merge``), so readers see the old or the
        new table, never half a merge.

        Source must be key-unique (caller's contract, as in SQL MERGE
        where multiple source matches are an error).  Write cost is
        O(source + matched addresses), never O(table) — the COW
        alternative rewrites every fragment containing a match.
        Read-side cost is the usual DV anti-join until
        :meth:`rewrite_deletes` folds it down."""
        from pyspark.sql import functions as _F

        attempt = 0

        def build(files: list[str]) -> tuple[list[str], str, list[str]]:
            nonlocal attempt
            head = self.manifest()
            tag = f"{name_suffix}.v{head['version'] + 1}" + (
                "" if attempt == 0 else f".r{attempt}"
            )
            attempt += 1
            keyed = (
                spark.read.parquet(
                    *[os.path.join(self.root, r) for r in files]
                )
                .withColumn("__fk", self._file_key())
                .withColumn("__pos", _F.col("_metadata.row_index"))
            )
            pending = head.get("deletes", [])
            if pending:
                old = spark.read.parquet(
                    *[os.path.join(self.root, r) for r in pending]
                ).select("file_key", "pos")
                keyed = keyed.join(
                    old,
                    (keyed["__fk"] == old["file_key"])
                    & (keyed["__pos"] == old["pos"]),
                    "left_anti",
                )
            # matched rows by address; the source side is keys-only and
            # typically small relative to the table -> AQE broadcasts.
            dv = (
                keyed.join(
                    source.select(_F.col(key).alias("__mk")).distinct(),
                    keyed[key] == _F.col("__mk"),
                    "left_semi",
                )
                .select(
                    _F.col("__fk").alias("file_key"),
                    _F.col("__pos").alias("pos"),
                )
                .coalesce(1)
            )
            dv_rel = self.write_fragment(dv, f"dv.{tag}")
            frag_rel = self.write_fragment(source, f"upsert_{tag}")
            return (
                files + [frag_rel],
                "merge",
                head.get("deletes", []) + [dv_rel],
            )

        return self.commit(build)

    def read_changes(
        self, spark: SparkSession, v_from: int, v_to: int
    ) -> DataFrame:
        """Change data feed: the row-level changes committed in
        versions ``(v_from, v_to]`` (the Delta CDF /
        ``table_changes()`` shape), as the data columns plus
        ``_change`` ('insert' | 'delete') and ``_commit_version``.

        Per-commit classification rides the manifest ``op`` field:

        * ``append`` — the added fragments' rows are inserts (a
          fragment is immutable, so its rows ARE the commit's rows);
        * ``delete-mor`` — the commit's NEW delete file addresses the
          deleted rows exactly; a semi-join of the prior snapshot
          against it recovers them (this is why deletion vectors make
          CDF cheap in real engines);
        * ``merge`` / ``stream-append`` — a merge emits BOTH: its DV
          rows are the matched rows' pre-images (an update appears as
          delete+insert, the standard CDF encoding absent pre/post-
          image tracking) and its added fragment's rows are inserts;
        * ``purge`` — rewrites files but changes no visible row:
          skipped, the dataChange=false rule;
        * ``delete`` (copy-on-write) — NOT row-addressable from
          metadata (the rewrite folds the removal into new bytes);
          raises with a pointer at :meth:`delete_where_mor`.  Matching
          the real-engine contract: CDF needs DV-style deletes or
          write-time change materialization.

        100 TB shape: each commit's changes read only that commit's
        added fragments or DV-semi-joined prior files — incremental
        consumers never rescan the table.  Driver work is O(versions)
        manifest reads."""
        from pyspark.sql import functions as _F

        out: DataFrame | None = None
        for v in range(v_from + 1, v_to + 1):
            m = self.manifest(v)
            prev = self.manifest(v - 1)
            op = m.get("op", "append")
            if op in ("purge", "optimize"):
                continue  # dataChange=false: files move, no row does
            if op == "delete":
                raise ValueError(
                    "version %d is a copy-on-write delete: not "
                    "row-addressable for CDF; use delete_where_mor"
                    % v
                )
            parts: list[DataFrame] = []
            if op in ("delete-mor", "merge"):
                new_dv = sorted(
                    set(m.get("deletes", [])) - set(prev.get("deletes", []))
                )
                dv = spark.read.parquet(
                    *[os.path.join(self.root, r) for r in new_dv]
                ).select("file_key", "pos")
                keyed = (
                    spark.read.parquet(
                        *[os.path.join(self.root, r) for r in prev["files"]]
                    )
                    .withColumn("__fk", self._file_key())
                    .withColumn("__pos", _F.col("_metadata.row_index"))
                )
                parts.append(
                    keyed.join(
                        dv,
                        (keyed["__fk"] == dv["file_key"])
                        & (keyed["__pos"] == dv["pos"]),
                        "left_semi",
                    )
                    .drop("__fk", "__pos")
                    .withColumn("_change", _F.lit("delete"))
                )
            if op in ("append", "stream-append", "merge"):
                added = sorted(set(m["files"]) - set(prev["files"]))
                if added:
                    parts.append(
                        spark.read.parquet(
                            *[os.path.join(self.root, r) for r in added]
                        ).withColumn("_change", _F.lit("insert"))
                    )
            for delta in parts:
                delta = delta.withColumn(
                    "_commit_version", _F.lit(v).cast("int")
                )
                out = delta if out is None else out.unionByName(delta)
        if out is None:
            raise ValueError(
                f"no data-changing commits in ({v_from}, {v_to}]"
            )
        return out

    def rewrite_deletes(self, spark: SparkSession, name_suffix: str = "purge") -> int:
        """Fold accumulated position deletes back into the data (the
        Delta PURGE / Iceberg rewrite_position_delete_files compaction):
        every fragment with pending DV rows is rewritten without them;
        untouched fragments carry over by reference; the new manifest
        has an EMPTY delete list.  After this, scan cost returns to a
        plain fragment read.  Fragment-granular like :meth:`delete_where`
        — only fragments that actually contain deleted rows rewrite."""
        import os as _os

        from pyspark.sql import functions as _F

        attempt = 0

        def build(files: list[str]) -> tuple[list[str], str, list[str]]:
            nonlocal attempt
            head = self.manifest()
            deletes = head.get("deletes", [])
            tag = name_suffix if attempt == 0 else f"{name_suffix}.r{attempt}"
            attempt += 1
            if not deletes:
                return files, "purge", []
            # fragment dirs that own at least one deleted row:
            # O(deleted rows -> distinct dirs) driver metadata.
            dv = spark.read.parquet(
                *[_os.path.join(self.root, r) for r in deletes]
            )
            dirty = {
                r["d"]
                for r in dv.select(
                    _F.substring_index("file_key", "/", 1).alias("d")
                )
                .distinct()
                .collect()  # O(dirty fragments) driver metadata
            }
            kept: list[str] = []
            for rel in files:
                frag_dir = _os.path.basename(rel.rstrip("/"))
                if frag_dir not in dirty:
                    kept.append(rel)
                    continue
                frag = self._apply_deletes(
                    spark,
                    spark.read.parquet(_os.path.join(self.root, rel)),
                    deletes,
                )
                kept.append(
                    self.write_fragment(frag, f"{frag_dir}_{tag}")
                )
            return kept, "purge", []

        return self.commit(build)

    def read_where(
        self,
        spark: SparkSession,
        col: str,
        lo,
        hi,
        version: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Stats-pruned snapshot scan: only fragments whose recorded
        [min, max] for ``col`` OVERLAPS [lo, hi] are listed at all —
        the file-level data skipping every table format drives from its
        manifest stats, here from the ``_stats.json`` sidecars.  A
        fragment written without stats can never be skipped (must-read,
        the conservative rule).  Returns ``(df, report)`` where df
        still carries the exact residual ``lo <= col <= hi`` filter
        (pruning is a superset guarantee, not the predicate) and report
        counts ``{"fragments_total", "fragments_read"}``.

        100 TB shape: the prune is O(fragments) driver-side metadata —
        one small JSON per fragment, no parquet footer opened, no task
        launched for a skipped fragment.  At cluster scale this is the
        difference between scanning the fleet and scanning one file."""
        from pyspark.sql import functions as _F

        m = self.manifest(version)
        if not m["files"]:
            raise ValueError(f"version {m['version']} is empty")
        keep: list[str] = []
        for rel in m["files"]:
            st = self.fragment_stats(rel)
            rng = None if st is None else st.get(col)
            if rng is None or not (rng[1] < lo or rng[0] > hi):
                keep.append(rel)
        report = {
            "fragments_total": len(m["files"]),
            "fragments_read": len(keep),
        }
        if not keep:
            base = self.read(spark, version).filter(_F.lit(False))
            return base, report
        df = self._apply_deletes(
            spark,
            spark.read.parquet(
                *[os.path.join(self.root, rel) for rel in keep]
            ),
            m.get("deletes", []),
        )
        return df.filter(_F.col(col).between(lo, hi)), report
