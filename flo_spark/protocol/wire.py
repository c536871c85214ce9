"""flo client/server wire protocol codec — byte-compatible with the
reference's message layout (flo-protocol/src/client.rs:240-691,
serializer at flo-protocol/src/serializer.rs).

Every message starts with a 1-byte tag (client.rs::headers:18-39); all
integers are big-endian; strings are u16-length-prefixed utf-8
(serializer.rs:59-62 — the module comment's "newline terminated" is
outdated, the parsers are length-prefixed).  The two event-carrying
messages (ProduceEvent, ReceiveEvent) are serialized as a HEADER whose
trailing u32 is the body length, followed by the raw body bytes
(client.rs:1-9) — the codec treats header+body as one logical message.

A null event id is serialized as counter=0 (actor then ignored),
matching ``parse_event_id`` (client.rs:335-347).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

# -- tags (client.rs::headers, 18-39) ----------------------------------
CLIENT_AUTH = 1
PRODUCE_EVENT = 2
RECEIVE_EVENT = 3
UPDATE_MARKER = 4
START_CONSUMING = 5
AWAITING_EVENTS = 6
PEER_ANNOUNCE = 7
PEER_UPDATE = 8
ACK_HEADER = 9
ERROR_HEADER = 10
CLUSTER_STATE = 11
SET_BATCH_SIZE = 12
NEXT_BATCH = 13
END_OF_BATCH = 14
STOP_CONSUMING = 15
CURSOR_CREATED = 16
NEW_START_CONSUMING = 17
SET_EVENT_STREAM = 18
EVENT_STREAM_STATUS = 19
CLIENT_ANNOUNCE = 170

#: max_events value meaning "unlimited" (client.rs:147)
CONSUME_UNLIMITED = 0

# -- error kinds (client.rs:43-47) -------------------------------------
ERROR_INVALID_NAMESPACE = 15
ERROR_INVALID_CONSUMER_STATE = 16
ERROR_INVALID_VERSION_VECTOR = 17
ERROR_STORAGE_ENGINE_IO = 18
ERROR_NO_STREAM = 19

ERROR_KINDS = {
    ERROR_INVALID_NAMESPACE,
    ERROR_INVALID_CONSUMER_STATE,
    ERROR_INVALID_VERSION_VECTOR,
    ERROR_STORAGE_ENGINE_IO,
    ERROR_NO_STREAM,
}


# -- messages (client.rs:102-274) --------------------------------------


@dataclass(frozen=True)
class EventId:
    """FloEventId: (counter, actor); counter 0 == null on the wire."""

    counter: int
    actor: int


@dataclass
class Announce:
    """First message from a client; server answers StreamStatus."""

    protocol_version: int = 1
    op_id: int = 0
    client_name: str = ""
    consume_batch_size: int | None = None


@dataclass
class PartitionStatus:
    partition_num: int
    head: int
    primary: bool


@dataclass
class StreamStatus:
    op_id: int
    name: str
    partitions: list[PartitionStatus] = field(default_factory=list)


@dataclass
class SetEventStream:
    op_id: int
    name: str


@dataclass
class ProduceEvent:
    op_id: int
    partition: int
    namespace: str
    parent_id: EventId | None
    data: bytes


@dataclass
class ReceiveEvent:
    id: EventId
    parent_id: EventId | None
    timestamp_ms: int
    namespace: str
    data: bytes


@dataclass
class AckEvent:
    op_id: int
    event_id: EventId


@dataclass
class NewStartConsuming:
    op_id: int
    version_vector: list[EventId] = field(default_factory=list)
    max_events: int = CONSUME_UNLIMITED
    namespace: str = "/**/*"


@dataclass
class CursorCreated:
    op_id: int
    batch_size: int


@dataclass
class StopConsuming:
    op_id: int


@dataclass
class SetBatchSize:
    batch_size: int


@dataclass
class NextBatch:
    pass


@dataclass
class EndOfBatch:
    pass


@dataclass
class AwaitingEvents:
    pass


@dataclass
class ErrorMessage:
    op_id: int
    kind: int
    description: str


# -- serialization -----------------------------------------------------

_U16 = struct.Struct(">H")
_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")


def _s(text: str) -> bytes:
    raw = text.encode("utf-8")
    return _U16.pack(len(raw)) + raw


def _eid(eid: EventId | None) -> bytes:
    if eid is None:
        return _U64.pack(0) + _U16.pack(0)
    return _U64.pack(eid.counter) + _U16.pack(eid.actor)


def serialize(msg) -> bytes:
    """Message -> wire bytes (header + body for the event messages)."""
    if isinstance(msg, Announce):
        return (
            bytes([CLIENT_ANNOUNCE])
            + _U32.pack(msg.protocol_version)
            + _U32.pack(msg.op_id)
            + _s(msg.client_name)
            + _U32.pack(msg.consume_batch_size or 0)
        )
    if isinstance(msg, StreamStatus):
        out = (
            bytes([EVENT_STREAM_STATUS])
            + _U32.pack(msg.op_id)
            + _s(msg.name)
            + _U16.pack(len(msg.partitions))
        )
        for p in msg.partitions:
            out += (
                _U16.pack(p.partition_num)
                + _U64.pack(p.head)
                + _U16.pack(1 if p.primary else 0)
            )
        return out
    if isinstance(msg, SetEventStream):
        return bytes([SET_EVENT_STREAM]) + _U32.pack(msg.op_id) + _s(msg.name)
    if isinstance(msg, ProduceEvent):
        return (
            bytes([PRODUCE_EVENT])
            + _s(msg.namespace)
            + _eid(msg.parent_id)
            + _U32.pack(msg.op_id)
            + _U16.pack(msg.partition)
            + _U32.pack(len(msg.data))
            + msg.data
        )
    if isinstance(msg, ReceiveEvent):
        return (
            bytes([RECEIVE_EVENT])
            + _eid(msg.id)
            + _eid(msg.parent_id)
            + _U64.pack(msg.timestamp_ms)
            + _s(msg.namespace)
            + _U32.pack(len(msg.data))
            + msg.data
        )
    if isinstance(msg, AckEvent):
        return (
            bytes([ACK_HEADER])
            + _U32.pack(msg.op_id)
            + _U64.pack(msg.event_id.counter)
            + _U16.pack(msg.event_id.actor)
        )
    if isinstance(msg, NewStartConsuming):
        out = (
            bytes([NEW_START_CONSUMING])
            + _U32.pack(msg.op_id)
            + _U16.pack(len(msg.version_vector))
        )
        for eid in msg.version_vector:
            out += _U64.pack(eid.counter) + _U16.pack(eid.actor)
        return out + _U64.pack(msg.max_events) + _s(msg.namespace)
    if isinstance(msg, CursorCreated):
        return (
            bytes([CURSOR_CREATED])
            + _U32.pack(msg.op_id)
            + _U32.pack(msg.batch_size)
        )
    if isinstance(msg, StopConsuming):
        return bytes([STOP_CONSUMING]) + _U32.pack(msg.op_id)
    if isinstance(msg, SetBatchSize):
        return bytes([SET_BATCH_SIZE]) + _U32.pack(msg.batch_size)
    if isinstance(msg, NextBatch):
        return bytes([NEXT_BATCH])
    if isinstance(msg, EndOfBatch):
        return bytes([END_OF_BATCH])
    if isinstance(msg, AwaitingEvents):
        return bytes([AWAITING_EVENTS])
    if isinstance(msg, ErrorMessage):
        return (
            bytes([ERROR_HEADER])
            + _U32.pack(msg.op_id)
            + bytes([msg.kind])
            + _s(msg.description)
        )
    raise TypeError(f"not a protocol message: {msg!r}")


# -- incremental parsing ----------------------------------------------


class NeedMore(Exception):
    """Internal: the buffer does not yet hold a complete message."""


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise NeedMore()
        out = bytes(self.buf[self.pos : self.pos + n])
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return _U16.unpack(self.take(2))[0]

    def u32(self) -> int:
        return _U32.unpack(self.take(4))[0]

    def u64(self) -> int:
        return _U64.unpack(self.take(8))[0]

    def string(self) -> str:
        return self.take(self.u16()).decode("utf-8")

    def event_id(self) -> EventId | None:
        counter = self.u64()
        actor = self.u16()
        return EventId(counter, actor) if counter > 0 else None


def parse_one(buf, pos: int = 0):
    """Parse one message starting at ``pos``; returns (message,
    new_pos).  Raises ``NeedMore`` when the buffer is incomplete and
    ``ValueError`` on an unknown tag."""
    c = _Cursor(buf, pos)
    tag = c.u8()
    if tag == CLIENT_ANNOUNCE:
        version, op_id = c.u32(), c.u32()
        name = c.string()
        batch = c.u32()
        return Announce(version, op_id, name, batch if batch > 0 else None), c.pos
    if tag == EVENT_STREAM_STATUS:
        op_id = c.u32()
        name = c.string()
        parts = []
        for _ in range(c.u16()):
            pn, head, prim = c.u16(), c.u64(), c.u16()
            parts.append(PartitionStatus(pn, head, prim == 1))
        return StreamStatus(op_id, name, parts), c.pos
    if tag == SET_EVENT_STREAM:
        return SetEventStream(c.u32(), c.string()), c.pos
    if tag == PRODUCE_EVENT:
        ns = c.string()
        parent = c.event_id()
        op_id = c.u32()
        partition = c.u16()
        data = c.take(c.u32())
        return ProduceEvent(op_id, partition, ns, parent, data), c.pos
    if tag == RECEIVE_EVENT:
        eid = c.event_id()
        if eid is None:
            raise ValueError("ReceiveEvent id must not be all zeros")
        parent = c.event_id()
        ts = c.u64()
        ns = c.string()
        data = c.take(c.u32())
        return ReceiveEvent(eid, parent, ts, ns, data), c.pos
    if tag == ACK_HEADER:
        op_id = c.u32()
        counter = c.u64()
        actor = c.u16()
        return AckEvent(op_id, EventId(counter, actor)), c.pos
    if tag == NEW_START_CONSUMING:
        op_id = c.u32()
        vv = []
        for _ in range(c.u16()):
            counter = c.u64()
            actor = c.u16()
            vv.append(EventId(counter, actor))  # zeroable (client.rs:325)
        max_events = c.u64()
        ns = c.string()
        return NewStartConsuming(op_id, vv, max_events, ns), c.pos
    if tag == CURSOR_CREATED:
        return CursorCreated(c.u32(), c.u32()), c.pos
    if tag == STOP_CONSUMING:
        return StopConsuming(c.u32()), c.pos
    if tag == SET_BATCH_SIZE:
        return SetBatchSize(c.u32()), c.pos
    if tag == NEXT_BATCH:
        return NextBatch(), c.pos
    if tag == END_OF_BATCH:
        return EndOfBatch(), c.pos
    if tag == AWAITING_EVENTS:
        return AwaitingEvents(), c.pos
    if tag == ERROR_HEADER:
        op_id = c.u32()
        kind = c.u8()
        if kind not in ERROR_KINDS:
            raise ValueError(f"unknown error kind {kind}")
        return ErrorMessage(op_id, kind, c.string()), c.pos
    raise ValueError(f"unknown message tag {tag}")


class Framer:
    """Incremental decoder over a socket byte stream: ``feed()`` bytes,
    iterate complete messages.  Partial messages (including an event
    header whose body hasn't fully arrived) stay buffered."""

    def __init__(self):
        self._buf = bytearray()

    def feed(self, data: bytes) -> list:
        self._buf.extend(data)
        out = []
        pos = 0
        while pos < len(self._buf):
            try:
                msg, pos = parse_one(self._buf, pos)
            except NeedMore:
                break
            out.append(msg)
        if pos:
            del self._buf[:pos]
        return out
