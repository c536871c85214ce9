"""Asyncio flo TCP client with op-id pipelining — the remote
counterpart of the reference's async connection
(flo-client-lib/src/async/mod.rs + ops/*): many in-flight operations
share one socket, responses correlate by ``op_id``, non-matching
messages are buffered rather than dropped (the AwaitResponse rule,
async/ops/await_response.rs — see the
``await_response_returns_matching_message_and_buffers_others`` case),
and a consume stream runs concurrently with produces on the same
connection (the interleaved state-machine cases, async/mod.rs:204-630).

Produce pipelining mirrors ``produce_all``
(async/ops/produce.rs:159-264): every ProduceEvent is written
back-to-back with its own op_id and the acks are awaited as futures,
so N events cost ~one round trip, and a produce future can be held
un-awaited while a consume iterator drains — true interleaving, not
just batching.

Reuses :mod:`flo_spark.protocol.wire` (``Framer``/``serialize``) — the
same byte-compatible codec as the sync client, so this connects to
:class:`flo_spark.protocol.server.FloTcpServer` or any server speaking
the reference protocol (flo-protocol/src/client.rs)."""

from __future__ import annotations

import asyncio
from collections.abc import AsyncIterator

from flo_spark.protocol import wire
from flo_spark.protocol.client import FloProtocolError


class AsyncFloClient:
    """One TCP connection, many concurrent operations.

    Use :meth:`connect` (performs the Announce handshake).  Responses
    route by ``op_id`` to the awaiting operation; uncorrelated consume
    traffic (ReceiveEvent / EndOfBatch / AwaitingEvents) routes to the
    active :meth:`consume` iterator, or is buffered until one starts —
    exactly the reference's received_message_buffer behavior."""

    def __init__(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ):
        self._reader = reader
        self._writer = writer
        self._framer = wire.Framer()
        self._op = 0
        self._op_waiters: dict[int, asyncio.Future] = {}
        self._buffer: list = []  # uncorrelated msgs before a consume
        self._consume_q: asyncio.Queue | None = None
        self._cursor_op: int | None = None
        self._reader_task: asyncio.Task | None = None
        self.current_stream: wire.StreamStatus | None = None

    @classmethod
    async def connect(
        cls,
        host: str,
        port: int,
        client_name: str = "flo-spark-async",
        consume_batch_size: int | None = None,
    ) -> "AsyncFloClient":
        reader, writer = await asyncio.open_connection(host, port)
        self = cls(reader, writer)
        self._reader_task = asyncio.ensure_future(self._read_loop())
        op = self._next_op()
        fut = self._register(op)
        await self._send(
            wire.Announce(1, op, client_name, consume_batch_size)
        )
        msg = await fut
        if isinstance(msg, wire.ErrorMessage):
            raise FloProtocolError(msg)
        self.current_stream = msg
        return self

    # -- plumbing ------------------------------------------------------
    def _next_op(self) -> int:
        self._op += 1
        return self._op

    def _register(self, op: int) -> asyncio.Future:
        fut = asyncio.get_event_loop().create_future()
        self._op_waiters[op] = fut
        return fut

    async def _send(self, msg) -> None:
        self._writer.write(wire.serialize(msg))
        await self._writer.drain()

    def _send_nowait(self, msg) -> None:
        self._writer.write(wire.serialize(msg))

    async def _read_loop(self) -> None:
        try:
            while True:
                data = await self._reader.read(65536)
                if not data:
                    break
                for msg in self._framer.feed(data):
                    self._dispatch(msg)
        except (OSError, asyncio.CancelledError):
            pass
        finally:
            err = ConnectionError("server closed the connection")
            for fut in self._op_waiters.values():
                if not fut.done():
                    fut.set_exception(err)
            self._op_waiters.clear()
            if self._consume_q is not None:
                self._consume_q.put_nowait(None)

    def _dispatch(self, msg) -> None:
        op = getattr(msg, "op_id", None)
        fut = self._op_waiters.pop(op, None) if op is not None else None
        if fut is not None:
            if not fut.done():
                fut.set_result(msg)
            return
        # uncorrelated: consume traffic (or an error for the live
        # cursor, whose waiter was consumed at CursorCreated)
        if self._consume_q is not None:
            self._consume_q.put_nowait(msg)
        else:
            self._buffer.append(msg)

    # -- API -----------------------------------------------------------
    async def set_event_stream(self, name: str) -> wire.StreamStatus:
        op = self._next_op()
        fut = self._register(op)
        await self._send(wire.SetEventStream(op, name))
        msg = await fut
        if isinstance(msg, wire.ErrorMessage):
            raise FloProtocolError(msg)
        self.current_stream = msg
        return msg

    def produce_nowait(
        self,
        partition: int,
        namespace: str,
        data: bytes,
        parent_id: wire.EventId | None = None,
    ) -> "asyncio.Future[wire.EventId]":
        """Write the ProduceEvent NOW and return a future for its ack.
        Hold several un-awaited to pipeline; await in any order."""
        op = self._next_op()
        fut = self._register(op)
        self._send_nowait(
            wire.ProduceEvent(op, partition, namespace, parent_id, data)
        )

        async def _ack() -> wire.EventId:
            msg = await fut
            if isinstance(msg, wire.ErrorMessage):
                raise FloProtocolError(msg)
            return msg.event_id

        return asyncio.ensure_future(_ack())

    async def produce(
        self,
        partition: int,
        namespace: str,
        data: bytes,
        parent_id: wire.EventId | None = None,
    ) -> wire.EventId:
        fut = self.produce_nowait(partition, namespace, data, parent_id)
        await self._writer.drain()
        return await fut

    async def produce_all(
        self,
        events: list[tuple[int, str, bytes]],
        parent_id: wire.EventId | None = None,
    ) -> list[wire.EventId]:
        """Pipelined batch produce (produce.rs:159-264): all sends
        first, then gather the acks in send order."""
        futs = [
            self.produce_nowait(p, ns, d, parent_id) for p, ns, d in events
        ]
        await self._writer.drain()
        return list(await asyncio.gather(*futs))

    async def consume(
        self,
        namespace: str = "/**/*",
        version_vector: dict[int, int] | None = None,
        max_events: int = wire.CONSUME_UNLIMITED,
        await_new: bool = False,
    ) -> AsyncIterator[wire.ReceiveEvent]:
        """Async-iterate events; produces may interleave on the same
        connection while this runs.  Semantics match the sync client:
        EndOfBatch answered with NextBatch transparently, iteration
        ends at AwaitingEvents unless ``await_new``."""
        if version_vector is None:
            version_vector = {
                p.partition_num: 0 for p in self.current_stream.partitions
            }
        op = self._next_op()
        self._consume_q = asyncio.Queue()
        for buffered in self._buffer:  # pre-cursor stragglers
            self._consume_q.put_nowait(buffered)
        self._buffer = []
        fut = self._register(op)
        vv = [wire.EventId(c, p) for p, c in sorted(version_vector.items())]
        await self._send(
            wire.NewStartConsuming(op, vv, max_events, namespace)
        )
        created = await fut
        if isinstance(created, wire.ErrorMessage):
            self._consume_q = None
            raise FloProtocolError(created)
        if not isinstance(created, wire.CursorCreated):
            self._consume_q = None
            raise RuntimeError(f"expected CursorCreated, got {created!r}")
        self.cursor = created
        self._cursor_op = op
        delivered = 0
        try:
            while True:
                msg = await self._consume_q.get()
                if msg is None:
                    raise ConnectionError("server closed the connection")
                if isinstance(msg, wire.ReceiveEvent):
                    delivered += 1
                    yield msg
                    if max_events and delivered >= max_events:
                        return
                elif isinstance(msg, wire.EndOfBatch):
                    await self._send(wire.NextBatch())
                elif isinstance(msg, wire.AwaitingEvents):
                    if not await_new:
                        await self.stop_consuming()
                        return
                elif isinstance(msg, wire.ErrorMessage):
                    raise FloProtocolError(msg)
                else:
                    raise RuntimeError(f"unexpected mid-consume: {msg!r}")
        finally:
            self._consume_q = None
            self._cursor_op = None

    async def stop_consuming(self) -> None:
        await self._send(wire.StopConsuming(self._cursor_op or self._op))

    async def close(self) -> None:
        if self._reader_task is not None:
            self._reader_task.cancel()
        try:
            self._writer.close()
            await self._writer.wait_closed()
        except (OSError, ConnectionError):
            pass

    async def __aenter__(self) -> "AsyncFloClient":
        return self

    async def __aexit__(self, *exc) -> None:
        await self.close()
