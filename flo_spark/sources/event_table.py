"""Event-stream table — flo's stream/partition/segment containers on
parquet (SURVEY.md §1.3/§1.5).

| flo                         | here                                   |
|-----------------------------|----------------------------------------|
| stream (named, N partitions)| a directory of parquet files           |
| partition (ActorId, thread) | ``partition=<n>/`` hive subdirectory   |
| segment (mmap file, rotated)| individual parquet file within it      |
| index (counter -> offset)   | parquet row-group min/max statistics   |

Rotation (A12) ≈ ``maxRecordsPerFile``; TTL expiry (A11) drops whole
files by their footer max(timestamp) — the same O(1)-per-segment drop
as flo's expire_old_events (controller/mod.rs:158-178), never a
row-level delete.

reference: flo-server/src/engine/event_stream/mod.rs:17-43 (options),
partition/segment/mod.rs:120-148 (segments), partition/index.rs (index).
"""

from __future__ import annotations

import glob as _pyglob
import json
import os
import shutil
from collections.abc import Mapping
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flo_spark.functions.glob import literal_first_segment
from flo_spark.operators.consume import consume as _consume
from flo_spark.operators.consume import head_status
from flo_spark.operators.produce import ProduceAck, assign_event_ids
from flo_spark.schema import (
    DEFAULT_NUM_PARTITIONS,
    DEFAULT_SEGMENT_MAX_RECORDS,
    EVENT_SCHEMA,
)

_OPTIONS_FILE = "_flo_stream.json"


def _ns0_expr() -> F.Column:
    """First namespace path segment, for storage bucketing.  Empty /
    missing segments map to '__root__' (hive treats empty partition
    values as null on read, which would break equality pruning)."""
    segs = F.split(F.col("namespace"), "/")
    first = F.when(
        F.col("namespace").startswith("/"), F.get(segs, 1)
    ).otherwise(F.get(segs, 0))
    return F.coalesce(F.nullif(first, F.lit("")), F.lit("__root__"))


class EventStream:
    """A named flo event stream backed by a parquet directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        num_partitions: int = DEFAULT_NUM_PARTITIONS,
        segment_max_records: int = DEFAULT_SEGMENT_MAX_RECORDS,
        event_retention_seconds: int | None = None,
        namespace_partitioning: bool = False,
    ) -> "EventStream":
        """Create the stream dir + options (EventStreamOptions analog,
        event_stream/mod.rs:17-37: 1 partition, retain forever by default).

        ``namespace_partitioning=True`` additionally buckets storage by
        the FIRST namespace path segment (``ns0=<segment>/`` hive dirs):
        a consume whose glob starts with a literal segment then prunes
        every other prefix at the file listing — directory-level scan
        elision, the SURVEY.md §4 namespace-pruning rule."""
        os.makedirs(path, exist_ok=True)
        opts = {
            "num_partitions": num_partitions,
            "segment_max_records": segment_max_records,
            "event_retention_seconds": event_retention_seconds,
            "namespace_partitioning": namespace_partitioning,
        }
        with open(os.path.join(path, _OPTIONS_FILE), "w") as f:
            json.dump(opts, f)
        return cls(spark, path)

    @property
    def options(self) -> dict:
        with open(os.path.join(self.path, _OPTIONS_FILE)) as f:
            return json.load(f)

    def _has_data(self) -> bool:
        return bool(_pyglob.glob(os.path.join(self.path, "partition=*")))

    # -- read ----------------------------------------------------------
    def _raw(self) -> DataFrame:
        """Scan including hive partition columns (partition[, ns0])."""
        schema = EVENT_SCHEMA
        if self.options.get("namespace_partitioning"):
            from pyspark.sql import types as T

            schema = T.StructType(
                [*EVENT_SCHEMA.fields, T.StructField("ns0", T.StringType())]
            )
        return self.spark.read.schema(schema).parquet(self.path)

    def events(self) -> DataFrame:
        if not self._has_data():
            return self.spark.createDataFrame([], EVENT_SCHEMA)
        # project away hive partition cols (partition is in the schema,
        # ns0 is storage-internal)
        return self._raw().select(*[f.name for f in EVENT_SCHEMA.fields])

    def head(self) -> dict[int, int]:
        """Per-partition head counters (A13). Partitions with no events
        report 0, matching flo's fast-forward init (controller/mod.rs:64-66).

        Computed from parquet FOOTER statistics only — O(files) metadata
        reads, no data scan — the Spark-file analog of flo's in-memory
        index (partition/index.rs:24-36).  At 100 TB a produce must not
        scan the table to learn the head; row-group max(event_counter)
        is exact because counters are written monotonically.  Falls back
        to a real aggregation for files lacking usable stats."""
        heads = {p: 0 for p in range(1, self.options["num_partitions"] + 1)}
        if not self._has_data():
            return heads
        import pyarrow.parquet as pq

        need_fallback = False
        for pdir in _pyglob.glob(os.path.join(self.path, "partition=*")):
            try:
                part = int(os.path.basename(pdir).split("=", 1)[1])
            except ValueError:
                continue
            part_max = 0
            for fpath in _pyglob.glob(
                os.path.join(pdir, "**", "*.parquet"), recursive=True
            ):
                meta = pq.read_metadata(fpath)
                names = list(meta.schema.to_arrow_schema().names)
                idx = names.index("event_counter")
                for rg in range(meta.num_row_groups):
                    stats = meta.row_group(rg).column(idx).statistics
                    if stats is None or not stats.has_min_max:
                        need_fallback = True
                        break
                    part_max = max(part_max, int(stats.max))
                if need_fallback:
                    break
            heads[part] = part_max
            if need_fallback:
                break
        if need_fallback:  # pragma: no cover - stats always present here
            for row in head_status(self.events()).collect():
                heads[row["partition"]] = row["head_counter"]
        return heads

    def highest_counter(self) -> int:
        """Stream-wide highest counter (highest_counter.rs:43-62 analog)."""
        heads = self.head()
        return max(heads.values()) if heads else 0

    def status(self) -> dict:
        """Full stream status snapshot — the EventStreamStatus analog
        (client.rs:207-221 / connection_state.rs:94-114): per-partition
        head counter plus storage shape (segment/file count, bytes).
        Metadata-only: parquet footers and file sizes, no data scan —
        what a monitoring endpoint polls at any table size."""
        heads = self.head()
        parts: dict[int, dict] = {
            p: {"head": h, "segments": 0, "bytes": 0} for p, h in heads.items()
        }
        for pdir in _pyglob.glob(os.path.join(self.path, "partition=*")):
            try:
                part = int(os.path.basename(pdir).split("=", 1)[1])
            except ValueError:
                continue
            info = parts.setdefault(part, {"head": 0, "segments": 0, "bytes": 0})
            for fpath in _pyglob.glob(
                os.path.join(pdir, "**", "*.parquet"), recursive=True
            ):
                info["segments"] += 1
                info["bytes"] += os.path.getsize(fpath)
        return {
            "name": os.path.basename(self.path.rstrip("/")),
            "highest_counter": max(heads.values()) if heads else 0,
            "partitions": parts,
        }

    # -- write ---------------------------------------------------------
    def produce(
        self,
        batch: DataFrame,
        round_robin: bool = True,
        order_by: str | None = None,
    ) -> "ProduceAck":
        """Append a produce batch; returns a :class:`ProduceAck` — the
        event count (an ``int`` subclass) carrying the assigned
        per-partition counter ranges, flo's produce-ack analog
        (connection_handler/producer.rs:47-81) (A1/A2).

        ``batch`` columns: namespace STRING, data BINARY, optional
        parent_counter/parent_actor, optional partition INT.  Without an
        explicit partition, events are spread round-robin like the flo
        client's default partition selection.  ``order_by`` names a
        batch column that fixes the in-partition id-assignment order
        (deterministic, reproducible counters); default is stable
        capture of input order.

        Single-materialization append: the batch is persisted before id
        assignment, so the per-partition counts job fills the cache and
        the write job reads it back — ONE scan of the input per append
        (the count ack is derived from the counts, not a third job).

        Concurrency: appends are single-writer per stream, matching the
        reference (every produce is serialized through the partition
        controller — controller/mod.rs:192-215).  Two uncoordinated
        producers could read the same head and assign overlapping
        counters; a deployment needing multi-writer appends puts a
        queue (or a transaction-log table format) in front, it does not
        relax the id contract.
        """
        nparts = self.options["num_partitions"]
        cols = batch.columns
        if "namespace" not in cols:
            raise ValueError(
                "produce batch must have a 'namespace' column "
                f"(got columns {cols})"
            )
        if "partition" not in cols:
            if round_robin:
                batch = batch.withColumn(
                    "partition",
                    (F.monotonically_increasing_id() % nparts + 1).cast("int"),
                )
            else:
                batch = batch.withColumn("partition", F.lit(1))
        if "parent_counter" not in cols:
            batch = batch.withColumn("parent_counter", F.lit(None).cast("long"))
        if "parent_actor" not in cols:
            batch = batch.withColumn("parent_actor", F.lit(None).cast("int"))
        if "data" not in cols:
            batch = batch.withColumn("data", F.lit(None).cast("binary"))

        # server-assigned timestamp at persist time (controller/mod.rs:197)
        batch = batch.withColumn("timestamp", F.current_timestamp())

        # ONE materialization per append, enforced with localCheckpoint
        # (eager) rather than persist: the batch carries nondeterministic
        # expressions when defaults apply (round-robin partition pick,
        # the __seq capture inside assign_event_ids, current_timestamp),
        # and a persisted block that gets evicted/lost would silently
        # RECOMPUTE them differently between the counts job and the
        # write job — reassigning rows across partitions and corrupting
        # the contiguous-id contract.  localCheckpoint truncates the
        # lineage, so block loss fails the produce loudly instead; the
        # client re-sends, exactly flo's lost-ack producer semantics
        # (async/ops/produce.rs:60-79).
        batch = batch.localCheckpoint(eager=True)
        try:
            base = self.highest_counter()  # footer-stats only, no data scan
            with_ids, ranges = assign_event_ids(
                batch, base_counter=base, order_by=order_by, with_ranges=True
            )
            self.append_verbatim(with_ids)
        finally:
            batch.unpersist()
        n = sum(hi - lo + 1 for lo, hi in ranges.values())
        return ProduceAck(n, ranges)

    # -- native-format migration ---------------------------------------
    def import_native(self, native_path: str) -> int:
        """Migrate a flo server's native ``.events`` data dir into this
        parquet-backed stream, preserving ids, timestamps, namespaces,
        payloads and parent lineage byte-for-byte — the on-ramp for a
        reference user switching engines (`EventStream.create()` +
        ``import_native(server_data_dir)`` and every consume works).

        Unlike :meth:`produce`, nothing is re-assigned: the imported
        counters ARE the stream's counters, so the stream must be empty
        (preserved ids cannot safely interleave with assigned ones).
        Returns the number of events imported."""
        from flo_spark.sources.flo_segment import read_flo_segments

        if self._has_data():
            raise ValueError(
                "import_native requires an empty stream: imported ids are "
                "preserved verbatim and cannot interleave with assigned ones"
            )
        self.append_verbatim(read_flo_segments(self.spark, native_path))
        # the imported data defines the partition set: widen the stored
        # num_partitions to cover every imported actor, else consume()'s
        # default version vector (built from the options file) would
        # silently exclude higher-numbered partitions
        heads = self.head()
        max_part = max(heads) if heads else 0
        if max_part > self.options["num_partitions"]:
            opts = self.options
            opts["num_partitions"] = max_part
            with open(os.path.join(self.path, _OPTIONS_FILE), "w") as f:
                json.dump(opts, f)
        return self.events().count()

    def append_verbatim(self, df: DataFrame) -> None:
        """Append EVENT_SCHEMA rows AS-IS — ids, timestamps and lineage
        preserved, no reservation off the stream head.  The storage
        layer under :meth:`import_native` and the native-dir replicator
        (``produce_stream.replicate_native``); any other writer of a
        stream that receives verbatim appends risks interleaving
        preserved counters with assigned ones."""
        out = df.select(
            *[F.col(f.name).cast(f.dataType) for f in EVENT_SCHEMA.fields]
        )
        partition_cols = ["partition"]
        if self.options.get("namespace_partitioning"):
            out = out.withColumn("ns0", _ns0_expr())
            partition_cols.append("ns0")
        (
            out.write.mode("append")
            .option("maxRecordsPerFile", self.options["segment_max_records"])
            .partitionBy(*partition_cols)
            .parquet(self.path)
        )

    def export_native(self, path: str, max_events_per_segment: int | None = None):
        """Write this stream out as native flo ``.events`` segment
        files (the off-ramp / interop sink; segment sizing defaults to
        the stream's own rotation setting).  Returns the per-segment
        write report DataFrame."""
        from flo_spark.sources.flo_segment import write_flo_segments

        return write_flo_segments(
            self.events(),
            path,
            max_events_per_segment
            or self.options.get(
                "segment_max_records", DEFAULT_SEGMENT_MAX_RECORDS
            ),
        )

    # -- query ---------------------------------------------------------
    def consume(
        self,
        namespace: str | None = None,
        version_vector: Mapping[int, int] | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        """Batch consume (A3-A7). ``version_vector=None`` consumes all
        partitions from 0, like the CLI's default start
        (client-cli/src/client_cli/consumer.rs:34-44).

        On a namespace-partitioned stream, a glob with a literal first
        segment adds an ``ns0 = <segment>`` partition filter: Spark
        prunes every other prefix directory at the file listing, so the
        scan never touches non-matching namespaces (the glob regex
        still applies afterwards — pruning is a superset)."""
        if version_vector is None:
            version_vector = {p: 0 for p in range(1, self.options["num_partitions"] + 1)}
        events = self.events()
        if self._has_data() and self.options.get("namespace_partitioning"):
            seg = literal_first_segment(namespace)
            if seg is not None:
                events = self._raw().filter(F.col("ns0") == seg).select(
                    *[f.name for f in EVENT_SCHEMA.fields]
                )
        return _consume(events, namespace, version_vector, limit)

    # -- retention (A11) ----------------------------------------------
    def expire_old_events(self, now: datetime | None = None) -> int:
        """Drop whole expired parquet files (segments) whose newest event
        is older than the retention window.  O(1) per file, mirrors
        expire_old_events (controller/mod.rs:158-178) + Segment::is_expired
        (segment/mod.rs:52-54).  Returns number of files deleted."""
        retention = self.options.get("event_retention_seconds")
        if retention is None or not self._has_data():
            return 0
        import pyarrow.parquet as pq

        now = now or datetime.now(timezone.utc)
        cutoff = now.timestamp() - retention
        deleted = 0
        # recursive: namespace-partitioned streams nest ns0=<seg>/ dirs
        # under each partition (same layout head() walks)
        for fpath in _pyglob.glob(
            os.path.join(self.path, "partition=*", "**", "*.parquet"),
            recursive=True,
        ):
            meta = pq.read_metadata(fpath)
            names = list(meta.schema.to_arrow_schema().names)
            ts_idx = names.index("timestamp")
            file_max = None
            for rg in range(meta.num_row_groups):
                stats = meta.row_group(rg).column(ts_idx).statistics
                if stats is None or not stats.has_min_max:
                    file_max = None
                    break
                v = stats.max
                if hasattr(v, "timestamp"):
                    v = v.timestamp()
                file_max = v if file_max is None else max(file_max, v)
            if file_max is None:
                # no usable footer stats (e.g. INT96): read just the
                # timestamp column of this one file — still per-segment
                col = pq.read_table(fpath, columns=["timestamp"])["timestamp"]
                import pyarrow.compute as pc

                m = pc.max(col).as_py()
                if m is None:
                    continue
                if m.tzinfo is None:
                    m = m.replace(tzinfo=timezone.utc)
                file_max = m.timestamp()
            if file_max < cutoff:
                os.remove(fpath)
                deleted += 1
        return deleted

    # -- maintenance: segment compaction -------------------------------
    def compact_segments(self, min_fill: float = 0.5) -> dict[str, int]:
        """Merge undersized segment files into full segments, per storage
        leaf directory (``partition=N/`` or ``partition=N/ns0=X/``).

        Streaming ingest fragments storage: every produce appends at
        least one file per partition, so a busy stream accumulates
        thousands of tiny segments and scan/listing cost grows with
        file count, not data size.  flo sidesteps this by appending to
        one open segment until rotation (segment/mod.rs:65-74); on
        immutable parquet the equivalent is this periodic rewrite —
        standard lakehouse compaction.

        Only files under ``min_fill * segment_max_records`` rows are
        rewritten (footer metadata decides — no data read for full
        segments), so compaction cost tracks the FRAGMENTED fraction,
        never table size.  Rows are re-sorted by ``event_counter``
        before writing, keeping row-group min/max tight for the
        counter-pushdown index analog.  Consume results are unchanged:
        same rows, same ids, same timestamps.

        Crash caveat: new files land before old ones are removed, so a
        crash mid-swap can leave duplicates (a manifest/Delta layer
        would close this; acceptable for an offline maintenance job).
        Streaming caveat: a checkpointed tail consumer tracks DELIVERED
        FILES (consume_tail_ordered's offset log), so compacting
        already-delivered segments makes the rewritten files look new on
        resume — run compaction before consumers attach, or restart
        their cursors from a version vector afterwards.

        Returns ``{"dirs_compacted", "files_removed", "files_written"}``.
        """
        from pyspark.sql import types as T

        seg_max = int(self.options["segment_max_records"])
        threshold = max(1, int(seg_max * min_fill))
        # data files do NOT contain the hive partition columns
        file_schema = T.StructType(
            [f for f in EVENT_SCHEMA.fields if f.name != "partition"]
        )
        report = {"dirs_compacted": 0, "files_removed": 0, "files_written": 0}
        if not self._has_data():
            return report
        import pyarrow.parquet as pq

        leaf_dirs = sorted(
            {
                os.path.dirname(f)
                for f in _pyglob.glob(
                    os.path.join(self.path, "partition=*", "**", "*.parquet"),
                    recursive=True,
                )
            }
        )
        for leaf in leaf_dirs:
            small, n_rows = [], 0
            for fpath in sorted(_pyglob.glob(os.path.join(leaf, "*.parquet"))):
                nr = pq.read_metadata(fpath).num_rows
                if nr < threshold:
                    small.append(fpath)
                    n_rows += nr
            if len(small) < 2:
                continue  # nothing to merge
            tmp = os.path.join(leaf, ".compact_tmp")
            shutil.rmtree(tmp, ignore_errors=True)
            n_out = max(1, -(-n_rows // seg_max))
            (
                self.spark.read.schema(file_schema)
                .parquet(*small)
                .repartitionByRange(n_out, "event_counter")
                .sortWithinPartitions("event_counter")
                .write.mode("overwrite")
                .option("maxRecordsPerFile", seg_max)
                .parquet(tmp)
            )
            moved = 0
            for newf in _pyglob.glob(os.path.join(tmp, "*.parquet")):
                shutil.move(newf, os.path.join(leaf, os.path.basename(newf)))
                moved += 1
            for oldf in small:
                os.remove(oldf)
            shutil.rmtree(tmp, ignore_errors=True)
            report["dirs_compacted"] += 1
            report["files_removed"] += len(small)
            report["files_written"] += moved
        return report

    # -- interchange (CSV/JSON/Parquet/ORC sources & sinks) ------------
    def export(self, path: str, fmt: str = "json") -> int:
        """Write the stream's events out as parquet/orc/json/csv/xml (the
        B-relational sink surface).  Binary payloads are base64-encoded
        for the text formats (flo's wire form is also length-prefixed
        bytes — client.rs:106-122; base64 is the text-safe analog);
        the columnar formats carry BINARY natively.  Returns the
        number of events exported."""
        df = self.events()
        n = df.count()
        # Spark's base64() emits MIME-chunked output (a newline every
        # 76 chars); single-line it so CSV rows stay one physical line
        # — the alternative, reading with multiLine=true, makes every
        # file unsplittable and serializes the scan at scale.
        b64 = F.regexp_replace(F.base64("data"), "[\\r\\n]", "")
        if fmt == "parquet":
            df.write.mode("overwrite").parquet(path)
        elif fmt == "orc":
            df.write.mode("overwrite").orc(path)
        elif fmt == "json":
            df.withColumn("data", b64).write.mode("overwrite").json(path)
        elif fmt == "csv":
            df.withColumn("data", b64).write.mode("overwrite").option(
                "header", True
            ).csv(path)
        elif fmt == "xml":
            # Spark 4 native XML source (the spark-xml package folded
            # into core).  Text format, so payloads travel base64 like
            # CSV/JSON.  Null parent ids are simply omitted elements;
            # the explicit read schema restores them as NULL.
            df.withColumn("data", b64).write.mode("overwrite").format(
                "xml"
            ).option("rowTag", "event").save(path)
        else:
            raise ValueError(f"unsupported export format: {fmt!r}")
        return n

    @staticmethod
    def read_events(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
        """Read an exported event set back into the canonical schema —
        the Parquet/ORC/CSV/JSON/XML scan surface.  Schema is always supplied
        explicitly (never inferred), matching flo's fixed envelope
        (SURVEY.md §1.2)."""
        if fmt == "parquet":
            return spark.read.schema(EVENT_SCHEMA).parquet(path)
        if fmt == "orc":
            return spark.read.schema(EVENT_SCHEMA).orc(path)
        from pyspark.sql import types as T

        text_schema = T.StructType(
            [
                f if f.name != "data" else T.StructField("data", T.StringType())
                for f in EVENT_SCHEMA.fields
            ]
        )
        if fmt == "json":
            raw = spark.read.schema(text_schema).json(path)
        elif fmt == "csv":
            raw = spark.read.schema(text_schema).option("header", True).csv(path)
        elif fmt == "xml":
            # rowTag must match the writer's.  XML records span lines,
            # so unlike CSV/JSON a shard is parallel at FILE granularity
            # only — export partitioning determines scan parallelism
            # (same caveat as the gzip JSONL shards).
            raw = (
                spark.read.schema(text_schema)
                .format("xml")
                .option("rowTag", "event")
                .load(path)
            )
        else:
            raise ValueError(f"unsupported read format: {fmt!r}")
        return raw.withColumn("data", F.unbase64("data")).select(
            *[F.col(f.name).cast(f.dataType) for f in EVENT_SCHEMA.fields]
        )

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


class StreamRegistry:
    """Multiple named streams under one root — the engine's stream
    catalog (EngineRef::get_stream, engine/mod.rs:69-81).  The default
    stream is "system", as in flo (engine/mod.rs:34-38);
    ``set_event_stream`` is A14's `USE <stream>`: it errors on unknown
    names exactly like the server's NoSuchStream
    (connection_state.rs:58-85)."""

    DEFAULT_STREAM = "system"

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._current = self.DEFAULT_STREAM
        if not os.path.exists(self._path(self.DEFAULT_STREAM)):
            EventStream.create(spark, self._path(self.DEFAULT_STREAM))

    def _path(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid stream name: {name!r}")
        return os.path.join(self.root, name)

    def create_stream(self, name: str, **options) -> EventStream:
        return EventStream.create(self.spark, self._path(name), **options)

    def stream_names(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, d, _OPTIONS_FILE))
        )

    def set_event_stream(self, name: str) -> EventStream:
        """Switch the connection's target stream; NoSuchStream on error."""
        if name not in self.stream_names():
            raise KeyError(f"NoSuchStream: {name!r}")
        self._current = name
        return self.current()

    def drop_stream(self, name: str) -> None:
        """Delete a stream and its storage; NoSuchStream on unknown
        names.  Dropping the current stream resets the connection to
        the default stream (recreated empty if it was the one
        dropped)."""
        if name not in self.stream_names():
            raise KeyError(f"NoSuchStream: {name!r}")
        EventStream(self.spark, self._path(name)).drop()
        if self._current == name:
            self._current = self.DEFAULT_STREAM
        if not os.path.exists(self._path(self.DEFAULT_STREAM)):
            EventStream.create(self.spark, self._path(self.DEFAULT_STREAM))

    def current(self) -> EventStream:
        return EventStream(self.spark, self._path(self._current))
