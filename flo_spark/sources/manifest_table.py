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

    def current_version(self) -> int:
        """Highest committed version, 0 if none.  O(manifests) listing."""
        best = 0
        for name in os.listdir(self._manifests):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    best = max(best, int(name[1:-5]))
                except ValueError:
                    continue
        return best

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifests, f"v{version}.json")

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        path = self._manifest_path(v)
        if v == 0 or not os.path.exists(path):
            return {"version": 0, "files": [], "op": "init"}
        with open(path) as fh:
            return json.load(fh)

    # -- write path --------------------------------------------------------

    def write_fragment(
        self, df: DataFrame, name: str, stats_cols: list[str] | None = None
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
        return rel

    def fragment_stats(self, rel: str) -> dict | None:
        """Per-column [min, max] recorded at write time, None if the
        fragment was written without ``stats_cols``."""
        path = os.path.join(self.root, rel, "_stats.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def _publish(self, version: int, files: list[str], op: str) -> int:
        body = {
            "version": version,
            "files": sorted(files),
            "op": op,
            # wall time is commit METADATA only — never part of query
            # results, so determinism of reads is unaffected.
            "committed_at": time.time(),
        }
        tmp = self._manifest_path(version) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(body, fh)
        try:
            # atomic put-if-absent: the one writer whose link lands owns
            # version N; everyone else gets CommitConflict and retries.
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as exc:
            raise CommitConflict(f"version {version} already committed") from exc
        finally:
            os.unlink(tmp)
        return version

    def commit(
        self, build: Callable[[list[str]], tuple[list[str], str]], retries: int = 10
    ) -> int:
        """Optimistic commit: ``build(current_files) -> (new_files, op)``
        runs against the head snapshot; on a version collision the head
        is re-read and ``build`` re-runs on the winner's snapshot."""
        for _ in range(retries + 1):
            head = self.manifest()
            files, op = build(list(head["files"]))
            try:
                return self._publish(head["version"] + 1, files, op)
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {retries} retries")

    def append(
        self, df: DataFrame, name: str, stats_cols: list[str] | None = None
    ) -> int:
        rel = self.write_fragment(df, name, stats_cols)
        return self.commit(lambda files: (files + [rel], "append"))

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
                frag = spark.read.parquet(os.path.join(self.root, rel))
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
            if name.startswith("v") and name.endswith(".json"):
                with open(os.path.join(self._manifests, name)) as fh:
                    referenced.update(json.load(fh)["files"])
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

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read at ``version`` (default: latest)."""
        m = self.manifest(version)
        if not m["files"]:
            raise ValueError(f"version {m['version']} is empty")
        paths = [os.path.join(self.root, rel) for rel in m["files"]]
        return spark.read.parquet(*paths)

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
        df = spark.read.parquet(
            *[os.path.join(self.root, rel) for rel in keep]
        )
        return df.filter(_F.col(col).between(lo, hi)), report
