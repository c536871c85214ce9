"""Native flo segment-file (``.events``) binary codec — read and write
flo's on-disk storage format directly, so segment files written by a
real flo server can be scanned by this engine (and files we write are
valid input for flo's own recovery scan).

This closes the one "partial" surface row (A18/A19 storage
de/serialization): the CSV/JSON interchange in
:mod:`flo_spark.sources.event_table` is the *text-safe analog*; this
module is the byte-exact format itself.

Layout (reference: flo-server/src/engine/event_stream/partition/segment/
persistent_event.rs:20-35 ``get_repr_length`` / ``write_event_unchecked``
and :69-103 ``validate``; header: segment/header.rs:10-58; all integers
big-endian per flo-protocol/src/client.rs:11)::

    segment file = 16-byte header | event* | zero padding
    header       = u64 create-time millis | u64 end-time millis
    event        = u32 total_len (= 48 + ns_len + data_len)
                 | 8B marker b"FLO_EVT\\n"
                 | u16 actor | u64 event_counter          (id)
                 | u16 parent_actor | u64 parent_counter  (counter 0 = null)
                 | u64 timestamp millis-since-epoch
                 | u32 ns_len  | namespace utf-8 bytes
                 | u32 data_len| data bytes

flo pre-allocates segments and zero-fills the tail
(segment/mod.rs:125-128), so a reader stops at the first position whose
marker bytes are zero; a *non-zero* marker mismatch is corruption and
raises, exactly like ``PersistentEvent::validate``.

Scale shape: one segment file == one Spark task on read (flo's own
unit of storage parallelism; segments are bounded at 1 GiB by the
reference default, event_stream/mod.rs:27-37) and one write task per
(partition, segment) group on write.  The codec itself is a per-file
Python hop over Arrow batches — the same budget as the multimodal
decoders — never per-row Python inside a relational plan.
"""

from __future__ import annotations

import io
import os
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from flo_spark.schema import EVENT_SCHEMA, ID_ORDER

MARKER = b"FLO_EVT\n"
HEADER_LEN = 16
#: fixed bytes per event before the two variable-length fields
EVENT_FIXED_LEN = 48

_EPOCH = pd.Timestamp("1970-01-01")

#: the fixed 44-byte prefix (total_len .. ns_len) as one precompiled
#: Struct — pack/unpack of the whole envelope head in a single call
_FIXED = struct.Struct(">I8sHQHQQI")


def encode_event(
    event_counter: int,
    actor: int,
    parent_counter: int | None,
    parent_actor: int | None,
    ts_millis: int,
    namespace: str,
    data: bytes | None,
) -> bytes:
    """One event in flo's on-disk byte layout (persistent_event.rs
    write_event_unchecked).  A null parent is written as the zero id —
    the reference writes ``parent_id().unwrap_or(zero)`` and reads
    counter==0 back as None regardless of the actor half."""
    if "\n" in namespace:
        # the reference forbids newlines in namespaces (the wire and
        # CLI treat \n as a terminator) — flo-event/src/lib.rs:197-200
        raise ValueError("namespace must not contain a newline")
    ns = namespace.encode("utf-8")
    payload = data if data is not None else b""
    total = EVENT_FIXED_LEN + len(ns) + len(payload)
    head = _FIXED.pack(
        total,
        MARKER,
        actor,
        event_counter,
        (parent_actor or 0) if parent_counter else 0,
        parent_counter or 0,
        ts_millis,
        len(ns),
    )
    return b"".join((head, ns, struct.pack(">I", len(payload)), payload))


def encode_segment(
    events: Iterator[tuple], create_millis: int, end_millis: int
) -> bytes:
    """Header + every event, in iteration order.  ``events`` yields
    ``(event_counter, actor, parent_counter, parent_actor, ts_millis,
    namespace, data)`` tuples."""
    buf = io.BytesIO()
    buf.write(struct.pack(">QQ", create_millis, end_millis))
    for ev in events:
        buf.write(encode_event(*ev))
    return buf.getvalue()


def segment_header(buf: bytes) -> tuple[int, int]:
    """(create_millis, end_millis) from a segment's 16-byte header."""
    if len(buf) < HEADER_LEN:
        raise ValueError(
            f"segment shorter than {HEADER_LEN}-byte header: {len(buf)}B"
        )
    return struct.unpack_from(">QQ", buf, 0)


def decode_segment(buf: bytes) -> Iterator[tuple]:
    """Yield ``(event_counter, actor, parent_counter, parent_actor,
    ts_millis, namespace, data)`` for each event; stop at the
    zero-filled pre-allocation tail; raise on corruption.

    Mirrors PersistentEvent::validate (persistent_event.rs:69-103):
    length/marker check, then ns/data length cross-check against
    total_len."""
    pos = HEADER_LEN
    n = len(buf)
    while pos + EVENT_FIXED_LEN <= n:
        (
            total_len,
            marker,
            actor,
            counter,
            p_actor,
            p_counter,
            ts_millis,
            ns_len,
        ) = _FIXED.unpack_from(buf, pos)
        if marker != MARKER:
            if total_len == 0 and marker == b"\x00" * 8:
                return  # zero-filled tail of a pre-allocated segment
            raise ValueError(f"invalid marker bytes at offset {pos}")
        if pos + EVENT_FIXED_LEN + ns_len > n:
            raise ValueError(f"namespace length too large at offset {pos}")
        ns_start = pos + 44
        namespace = buf[ns_start : ns_start + ns_len].decode("utf-8")
        (data_len,) = struct.unpack_from(">I", buf, ns_start + ns_len)
        if total_len != EVENT_FIXED_LEN + ns_len + data_len:
            raise ValueError(f"mismatched lengths at offset {pos}")
        data_start = ns_start + ns_len + 4
        if data_start + data_len > n:
            raise ValueError(f"data length too large at offset {pos}")
        data = bytes(buf[data_start : data_start + data_len])
        yield (
            counter,
            actor,
            p_counter if p_counter else None,
            p_actor if p_counter else None,
            ts_millis,
            namespace,
            data,
        )
        pos += total_len


#: the flo Data Source writer stages uncommitted segments here; every
#: segment-listing walk must skip it or half-written / never-committed
#: files get scanned as real segments (duplicate or torn events)
STAGING_DIRNAME = "_staging"


def list_segment_files(root: str) -> dict[str, list[tuple[int, str]]]:
    """``{dir: [(segment_num, path), ...] sorted by number}`` for every
    ``.events`` file under ``root`` — the ONE shared walk used by all
    readers and maintenance ops.  ``_staging`` subtrees (the writer's
    two-phase-commit scratch space) are pruned: a file there is either
    mid-write, a retried task's abandoned loser, or a crash leftover —
    never data."""
    by_dir: dict[str, list[tuple[int, str]]] = {}
    for r, dirs, files in os.walk(root):
        dirs[:] = [d for d in dirs if d != STAGING_DIRNAME]
        for fname in files:
            if not fname.endswith(".events"):
                continue
            try:
                num = int(fname[: -len(".events")])
            except ValueError:
                num = -1  # non-flo-named files sort first (sealed)
            by_dir.setdefault(r, []).append((num, os.path.join(r, fname)))
    for entries in by_dir.values():
        entries.sort()
    return by_dir


def split_sealed_active(root: str) -> tuple[list[str], list[str]]:
    """Sealed vs active segment paths.  A rotated segment is never
    written again (segment/mod.rs:65-74), so every file except the
    max-numbered one per dir is immutable."""
    sealed: list[str] = []
    active: list[str] = []
    for entries in list_segment_files(root).values():
        sealed.extend(p for _n, p in entries[:-1])
        active.append(entries[-1][1])
    return sealed, active


_WRITE_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType()),
        T.StructField("segment_num", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def write_flo_segments(
    df: DataFrame, path: str, max_events_per_segment: int = 1_000_000
) -> DataFrame:
    """Write an EVENT_SCHEMA DataFrame as native flo segment files:
    ``<path>/partition=<p>/<n>.events``, ``n`` 1-based in id order
    (flo names segments the same way, partition/mod.rs:48-53).

    Distributed, with NO whole-partition task: the id-order rank that
    decides segment membership is computed as range-partitioned local
    row_numbers plus a prefix-sum offset per (partition, range-bucket)
    — the offsets job collects O(shuffle partitions) rows, the same
    broadcast-offsets trick as ``operators.produce.assign_event_ids``
    — so a flo partition of any size spreads across the full cluster
    instead of sorting inside one window task.  The ranged frame is
    persisted so the counts job and the write job see ONE
    materialization (range boundaries are sampled; recomputation could
    re-draw them).  Header times are the segment's min/max event time
    (content-derived for determinism; the reference stamps wall-clock
    create time + rotation deadline, which a converter cannot
    reproduce).

    Returns the per-segment write report (materialized eagerly so the
    write happens now, like ``DataFrame.write``).
    """
    spark = df.sparkSession
    nbuckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(nbuckets, "partition", *ID_ORDER)
        .withColumn("_bucket", F.spark_partition_id())
        .persist()
    )
    from collections import defaultdict

    per_part: dict[int, list] = defaultdict(list)
    for r in ranged.groupBy("partition", "_bucket").count().collect():
        per_part[r["partition"]].append((r["_bucket"], r["count"]))
    offs = []
    for part, lst in per_part.items():
        acc = 0
        # range-bucket ids ascend with the (partition, counter, actor)
        # sort order, so cumulating in bucket order is the global rank
        for b, cnt in sorted(lst):
            offs.append((int(part), int(b), acc))
            acc += int(cnt)
    offsets_df = spark.createDataFrame(
        offs or [], "partition int, _bucket int, _off long"
    )
    rn = F.row_number().over(
        Window.partitionBy("partition", "_bucket").orderBy(*ID_ORDER)
    )
    bucketed = (
        ranged.join(F.broadcast(offsets_df), ["partition", "_bucket"])
        .withColumn(
            "segment_num",
            ((rn - F.lit(1) + F.col("_off")) / F.lit(max_events_per_segment))
            .cast("int")
            + F.lit(1),
        )
        .drop("_bucket", "_off")
    )

    def _write(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        part, seg = int(key[0]), int(key[1])
        pdf = pdf.sort_values(["event_counter", "actor"])
        ts_ms = (
            (pdf["timestamp"] - _EPOCH) // pd.Timedelta(milliseconds=1)
        ).astype("int64")
        events = zip(
            pdf["event_counter"].astype("int64"),
            pdf["actor"].astype("int64"),
            [None if pd.isna(v) else int(v) for v in pdf["parent_counter"]],
            [None if pd.isna(v) else int(v) for v in pdf["parent_actor"]],
            ts_ms,
            pdf["namespace"],
            pdf["data"],
        )
        blob = encode_segment(events, int(ts_ms.min()), int(ts_ms.max()))
        seg_dir = os.path.join(path, f"partition={part}")
        os.makedirs(seg_dir, exist_ok=True)
        out = os.path.join(seg_dir, f"{seg}.events")
        with open(out, "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            {
                "partition": [part],
                "segment_num": [seg],
                "n_events": [len(pdf)],
                "n_bytes": [len(blob)],
            }
        )

    try:
        report = (
            bucketed.groupBy("partition", "segment_num")
            .applyInPandas(_write, schema=_WRITE_REPORT_SCHEMA)
            .cache()
        )
        report.count()  # force the write
    finally:
        ranged.unpersist()
    return report


#: events per decoded Arrow batch — caps decode memory at
#: O(chunk x avg event size) on top of the (bounded, <= 1 GiB) blob
#: itself, instead of materializing a whole segment's rows at once
DECODE_CHUNK_EVENTS = 65_536


def _rows_to_frame(rows: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(
        rows,
        columns=[
            "event_counter",
            "actor",
            "parent_counter",
            "parent_actor",
            "ts_millis",
            "namespace",
            "data",
        ],
    )
    out["timestamp"] = _EPOCH + pd.to_timedelta(
        out.pop("ts_millis"), unit="ms"
    )
    out["partition"] = out["actor"]
    return out[[f.name for f in EVENT_SCHEMA.fields]]


def _decode_content(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binaryFile ``content`` column -> event rows,
    yielded in bounded chunks (the decoder is a generator, so rows
    stream out of the blob without an all-rows materialization)."""
    for pdf in batches:
        for blob in pdf["content"]:
            rows: list[tuple] = []
            for ev in decode_segment(bytes(blob)):
                rows.append(ev)
                if len(rows) >= DECODE_CHUNK_EVENTS:
                    yield _rows_to_frame(rows)
                    rows = []
            if rows:
                yield _rows_to_frame(rows)


def read_flo_segments(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory of native flo segment files into the canonical
    event schema.  One Spark task per segment file (``binaryFile``
    yields one row per file; segments are <= 1 GiB by the reference
    default, so a file always fits an executor batch).  ``partition``
    is taken from each event's actor half — in flo the partition IS
    the ActorId (SURVEY.md §1.1), so this also reads bare ``*.events``
    files that a real flo server laid out without hive dirs."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.events")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("content")
    )
    return raw.mapInPandas(_decode_content, schema=EVENT_SCHEMA)


def tail_flo_segments(
    spark: SparkSession,
    path: str,
    namespace: str | None = None,
    version_vector=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming consume over a directory of IMMUTABLE native segment
    files (an archive, an export, a stopped server's data dir) with
    the standard consume filters (namespace glob, version-vector
    cursor) on top.  Pair with ``run_to_memory`` /
    ``consume_tail_ordered``'s sinks exactly like the parquet-backed
    ``consume_stream``.

    IMMUTABILITY CONTRACT: Spark's file-stream source reads each file
    exactly once at listing time — a file that grows afterwards is
    never re-read.  A LIVE flo server appends into its active
    (highest-numbered) segment, so tailing a live dir through here
    would silently capture only the active segment's
    as-of-listing prefix.  For live dirs use
    :class:`NativeDirTailer`, which delivers at sealed-segment
    granularity (a rotated segment is never written again).

    Delivery granularity is one segment file per source "file" —
    flo's own rotation unit — so ``max_files_per_trigger`` is the
    credit-flow analog at segment granularity (A8)."""
    from flo_spark.operators.consume import (
        namespace_filter,
        version_vector_filter,
    )

    # binaryFile's schema is fixed by the format; streaming sources
    # must state it explicitly (no inference on readStream)
    binary_file_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", "*.events")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(path).select("content").mapInPandas(
        _decode_content, schema=EVENT_SCHEMA
    )
    if version_vector is not None:
        df = df.filter(version_vector_filter(version_vector))
    ns = namespace_filter(namespace)
    if ns is not None:
        df = df.filter(ns)
    return df


class NativeDirTailer:
    """LIVE tail of a flo server's data directory, at sealed-segment
    granularity.

    Spark's file-stream source assumes files are immutable once listed,
    so :func:`tail_flo_segments` is correct only for archived segment
    dirs; a live flo server keeps appending into the ACTIVE
    (highest-numbered) segment after the source would have listed it,
    and those later events would be silently lost.  This tailer closes
    that gap the way flo's own storage rules allow: a rotated segment
    is never written again (segment/mod.rs:65-74 — rotation moves the
    writer to a new file), so every segment EXCEPT the
    highest-numbered one per partition dir is sealed and safe to read
    exactly once.  Each poll processes newly sealed segments through
    the batch scan path, applies the consume filters, and hands the
    (counter, actor)-ordered rows to ``callback``; the processed-file
    set persists to ``checkpoint_file`` (written after the callback —
    at-least-once on crash, exactly like the foreachBatch cursor).

    ``stop(drain_active=True)`` reads the active segments too — correct
    once the server has stopped or when a final snapshot is acceptable.

    A sweep is capped at ``max_segments_per_sweep`` files (delivered in
    (partition dir, segment number) order; the remainder carries to the
    next sweep, ``backlog`` reports it): a cold start over a large dir
    would otherwise scan AND ``collect()`` every historical segment in
    one batch and spike the driver.  The thread loop and
    ``drain_active`` both keep sweeping back-to-back while a backlog
    remains, so the cap bounds memory, not throughput.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        callback,
        namespace: str | None = None,
        version_vector=None,
        checkpoint_file: str | None = None,
        max_segments_per_sweep: int = 64,
    ):
        self.spark = spark
        self.path = path
        self.callback = callback
        self.namespace = namespace
        self.version_vector = version_vector
        self.checkpoint_file = checkpoint_file
        self.max_segments_per_sweep = max_segments_per_sweep
        self.backlog = 0
        self._processed: set[str] = set()
        self._thread = None
        self._stop_evt = None
        if checkpoint_file and os.path.exists(checkpoint_file):
            import json

            with open(checkpoint_file) as f:
                self._processed = set(json.load(f))

    def _segments(self) -> tuple[list[str], list[str]]:
        """(sealed, active) segment file paths, active = max-numbered
        per directory (shared walk; skips writer ``_staging`` dirs)."""
        return split_sealed_active(self.path)

    def poll_once(self, include_active: bool = False) -> int:
        """Process newly sealed segments (plus active ones when
        ``include_active``); returns the number of events delivered."""
        from flo_spark.operators.consume import (
            namespace_filter,
            version_vector_filter,
        )

        sealed, active = self._segments()
        todo = [p for p in sealed if p not in self._processed]
        if include_active:
            todo += [p for p in active if p not in self._processed]
        if not todo:
            self.backlog = 0
            return 0
        # bounded sweep in (dir, segment number) order; remainder
        # carries to the next sweep
        todo.sort(
            key=lambda p: (
                os.path.dirname(p),
                int(os.path.basename(p)[: -len(".events")]),
            )
        )
        self.backlog = max(0, len(todo) - self.max_segments_per_sweep)
        todo = todo[: self.max_segments_per_sweep]
        df = (
            self.spark.read.format("binaryFile")
            .load(todo)
            .select("content")
            .mapInPandas(_decode_content, schema=EVENT_SCHEMA)
        )
        if self.version_vector is not None:
            df = df.filter(version_vector_filter(self.version_vector))
        ns = namespace_filter(self.namespace)
        if ns is not None:
            df = df.filter(ns)
        rows = df.orderBy("event_counter", "actor").collect()
        if rows:
            self.callback(rows)
        self._processed.update(todo)
        if self.checkpoint_file:
            import json

            tmp = self.checkpoint_file + ".tmp"
            with open(tmp, "w") as f:
                json.dump(sorted(self._processed), f)
            os.replace(tmp, self.checkpoint_file)
        return len(rows)

    def start(self, poll_interval: float = 1.0) -> "NativeDirTailer":
        import threading

        self._stop_evt = threading.Event()

        def _loop():
            while not self._stop_evt.is_set():
                self.poll_once()
                while self.backlog and not self._stop_evt.is_set():
                    self.poll_once()  # drain the capped-sweep remainder
                self._stop_evt.wait(poll_interval)

        self._thread = threading.Thread(target=_loop, daemon=True)
        self._thread.start()
        return self

    def stop(self, drain_active: bool = False) -> None:
        if self._stop_evt is not None:
            self._stop_evt.set()
            self._thread.join()
        if drain_active:
            self.poll_once(include_active=True)
            while self.backlog:
                self.poll_once(include_active=True)


def expire_native_segments(
    root: str, retention_millis: int, now_millis: int | None = None
) -> dict:
    """TTL expiry over a native flo data dir (A11,
    controller/mod.rs:158-178): per partition dir, delete the
    CONTIGUOUS PREFIX of sealed segments whose header end-time is
    older than ``now - retention`` — whole-file drops costing one
    16-byte header read each (never a per-event delete), stopping at
    the first unexpired segment exactly like the reference's
    take_while (the comparison there reads inverted as written; the
    embedded TTL test and our parquet ``EventStream.expire_old_events``
    pin the drop-expired-prefix intent this follows).  The ACTIVE
    (max-numbered) segment never expires — the reference's writer
    always keeps it."""
    import struct as _struct
    import time as _time

    if now_millis is None:
        now_millis = int(_time.time() * 1000)
    cutoff = now_millis - retention_millis
    report = {"files_deleted": 0, "files_kept": 0, "events_dropped": 0}
    for entries in list_segment_files(root).values():
        for i, (_num, path) in enumerate(entries):
            is_active = i == len(entries) - 1
            with open(path, "rb") as f:
                head = f.read(HEADER_LEN)
            if is_active or len(head) < HEADER_LEN:
                report["files_kept"] += 1
                break
            _create, end = _struct.unpack(">QQ", head)
            if end >= cutoff:
                report["files_kept"] += len(entries) - i
                break  # take_while: stop at the first unexpired
            report["events_dropped"] += sum(
                1 for _ in decode_segment(open(path, "rb").read())
            )
            os.remove(path)
            report["files_deleted"] += 1
    return report


def native_head_status(root: str, full_scan: bool = False) -> list[tuple]:
    """Per-partition head snapshot over a native dir — A13's
    EventStreamStatus (connection_state.rs:94-114) without a server:
    ``[(partition, head_counter, primary), ...]`` sorted by partition.

    The cheap path decodes only each dir's TAIL segments, newest
    first, until one yields events (the reference fast-forwards its
    counter from the tail the same way, controller/mod.rs:64-66) —
    exact for flo's one-actor-per-dir layout.  For mixed-actor dirs
    pass ``full_scan=True`` to fold every segment.  ``primary`` is
    constantly true: the embedded/single-engine deployment owns every
    partition it reads (client.rs:207-221; clustering is vestigial)."""
    heads: dict[int, int] = {}
    for entries in list_segment_files(root).values():
        paths = [p for _n, p in entries]
        scan = paths if full_scan else reversed(paths)
        for path in scan:
            found = False
            buf = open(path, "rb").read()
            it = decode_segment(buf)
            while True:
                try:
                    ev = next(it)
                except StopIteration:
                    break
                except ValueError:
                    break  # torn active tail
                found = True
                if ev[0] > heads.get(ev[1], 0):
                    heads[ev[1]] = ev[0]
            if found and not full_scan:
                break
    return [(a, heads[a], True) for a in sorted(heads)]


def fsck_native_dir(root: str) -> dict:
    """Integrity check for a native flo data dir — the reference's
    recovery scan (mmap.rs:111-134) and PersistentEvent::validate
    (persistent_event.rs:69-103) packaged as an operational tool
    (``python -m flo_spark --stream-dir DIR --native fsck``).

    Per segment file: header shape (16 bytes, create <= end), full
    event decode (marker / length cross-checks), torn-tail
    classification (PARKED on the active segment — an in-flight
    append, exactly what the recovery scan tolerates — but an ERROR on
    a sealed one, where nothing should ever append again).  Per
    partition dir: counter monotonicity across segment numbers (the
    invariant every reader's file pruning relies on) and header
    end-times covering the events (an end-time below the last event's
    timestamp lets the TTL sweep expire live data).

    Returns ``{files_ok, n_events, errors: [...], warnings: [...],
    torn_active: [...], heads: {actor: head}}`` — empty errors ==
    healthy.  Pure driver-side sequential scan: fsck is an admin
    command, not a query path."""
    import struct as _struct

    report = {
        "files_ok": 0,
        "n_events": 0,
        "errors": [],
        "warnings": [],
        "torn_active": [],
        "heads": {},
    }
    for d, entries in list_segment_files(root).items():
        prev_max = None
        for i, (_num, path) in enumerate(entries):
            is_active = i == len(entries) - 1
            try:
                with open(path, "rb") as f:
                    buf = f.read()
            except OSError as err:
                report["errors"].append(f"{path}: unreadable: {err}")
                continue
            if len(buf) < HEADER_LEN:
                report["errors"].append(f"{path}: short header ({len(buf)}B)")
                continue
            create_ms, end_ms = _struct.unpack(">QQ", buf[:HEADER_LEN])
            if end_ms < create_ms:
                report["warnings"].append(
                    f"{path}: header end-time precedes create-time"
                )
            n, file_min, file_max, max_ts, torn = 0, None, None, None, None
            it = decode_segment(buf)
            while True:
                try:
                    ev = next(it)
                except StopIteration:
                    break
                except ValueError as err:
                    torn = str(err)
                    break
                n += 1
                file_min = ev[0] if file_min is None else min(file_min, ev[0])
                file_max = ev[0] if file_max is None else max(file_max, ev[0])
                max_ts = ev[4] if max_ts is None else max(max_ts, ev[4])
                report["heads"][ev[1]] = max(report["heads"].get(ev[1], 0), ev[0])
            report["n_events"] += n
            if torn is not None:
                if is_active:
                    report["torn_active"].append(f"{path}: {torn}")
                else:
                    report["errors"].append(f"{path}: sealed file torn: {torn}")
                    continue
            if max_ts is not None and end_ms < max_ts:
                report["warnings"].append(
                    f"{path}: header end-time {end_ms} < last event "
                    f"timestamp {max_ts} (TTL could expire live data)"
                )
            if prev_max is not None and file_min is not None and file_min <= prev_max:
                report["warnings"].append(
                    f"{path}: first counter {file_min} <= previous "
                    f"segment's max {prev_max} — within-dir monotonicity "
                    "broken; file pruning will be conservative"
                )
            if file_max is not None:
                prev_max = file_max
            report["files_ok"] += 1
    return report
