"""Async pipelined TCP client (protocol/async_client.py) against the
in-process FloTcpServer — mirrors the reference's async-connection
state-machine cases (flo-client-lib/src/async/mod.rs:204-630):
pipelined produce_all, op-id response correlation with buffering of
non-matching messages, and produce interleaved with a LIVE consume on
one socket.  Tests drive the event loop with asyncio.run (no
pytest-asyncio dependency)."""

import asyncio

import pytest

from flo_spark.protocol.async_client import AsyncFloClient
from flo_spark.protocol.client import FloProtocolError
from flo_spark.protocol.server import FloTcpServer


@pytest.fixture()
def server(tmp_path):
    with FloTcpServer(str(tmp_path / "flo_data")) as srv:
        yield srv


def test_async_handshake_and_pipelined_produce_all(server):
    async def scenario():
        async with await AsyncFloClient.connect(
            server.host, server.port, client_name="async-t1"
        ) as c:
            assert c.current_stream.name == "default"
            events = [
                ((i % 2) + 1, f"/pipe/{i}", f"e{i}".encode())
                for i in range(20)
            ]
            ids = await c.produce_all(events)
            per_part = {}
            for (part, _ns, _d), eid in zip(events, ids):
                assert eid.actor == part
                per_part.setdefault(part, []).append(eid.counter)
            assert per_part[1] == list(range(1, 11))
            assert per_part[2] == list(range(1, 11))
            got = []
            async for ev in c.consume(version_vector={1: 0, 2: 0}):
                got.append(ev)
            assert len(got) == 20

    asyncio.run(scenario())


def test_async_produce_while_consuming_one_socket(server):
    """The reference's signature interleaving: a consume stream stays
    open with AwaitingEvents while produces fire on the SAME
    connection; their acks resolve mid-consume and the produced events
    flow back through the live cursor."""

    async def scenario():
        c = await AsyncFloClient.connect(server.host, server.port)
        ids = await c.produce_all(
            [(1, f"/seed/{i}", f"s{i}".encode()) for i in range(5)]
        )
        assert [e.counter for e in ids] == [1, 2, 3, 4, 5]
        got = []
        pending = []
        async for ev in c.consume(version_vector={1: 0}, await_new=True):
            got.append(ev)
            if len(got) == 3:
                # fire-and-hold: cursor is live, acks not yet awaited
                pending.append(c.produce_nowait(1, "/live/x", b"live1"))
                pending.append(c.produce_nowait(1, "/live/y", b"live2"))
            if len(got) == 7:
                break
        acks = [await f for f in pending]
        assert [a.counter for a in acks] == [6, 7]
        assert [e.id.counter for e in got] == [1, 2, 3, 4, 5, 6, 7]
        assert got[5].namespace == "/live/x"
        assert got[6].data == b"live2"
        await c.stop_consuming()
        await c.close()

    asyncio.run(scenario())


def test_async_error_correlates_by_op_id(server):
    """An ErrorMessage resolves only ITS op's future: a bad
    SetEventStream raises while an in-flight produce still acks."""

    async def scenario():
        async with await AsyncFloClient.connect(
            server.host, server.port
        ) as c:
            ack = c.produce_nowait(1, "/a", b"x")
            with pytest.raises(FloProtocolError) as err:
                await c.set_event_stream("no-such-stream")
            assert "no-such-stream" in str(err.value)
            eid = await ack
            assert (eid.counter, eid.actor) == (1, 1)

    asyncio.run(scenario())


def test_async_consume_max_events_and_namespace(server):
    async def scenario():
        async with await AsyncFloClient.connect(
            server.host, server.port
        ) as c:
            await c.produce_all(
                [(1, "/keep/a", b"1"), (1, "/drop/b", b"2"),
                 (1, "/keep/c", b"3"), (1, "/keep/d", b"4")]
            )
            got = []
            async for ev in c.consume(
                namespace="/keep/*", version_vector={1: 0}, max_events=2
            ):
                got.append(ev.namespace)
            assert got == ["/keep/a", "/keep/c"]

    asyncio.run(scenario())


# ---------------------------------------------------------------------------
# property test: op-id dispatch — matching futures resolve, everything
# else buffers (the reference AwaitResponse rule) in arrival order
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from flo_spark.protocol import wire


@st.composite
def _msg_stream(draw):
    """A shuffled mix of op-correlated and uncorrelated messages plus
    the set of op ids a client is actually waiting on."""
    ops = draw(st.lists(st.integers(1, 40), min_size=0, max_size=8,
                        unique=True))
    msgs = []
    for op in draw(st.lists(st.integers(1, 50), max_size=12)):
        msgs.append(wire.AckEvent(op, wire.EventId(op, 1)))
    for _ in range(draw(st.integers(0, 6))):
        msgs.append(wire.EndOfBatch())
        msgs.append(wire.AwaitingEvents())
    draw(st.randoms()).shuffle(msgs)
    return ops, msgs


@given(_msg_stream())
@settings(max_examples=200, deadline=None)
def test_dispatch_routes_by_op_id_and_buffers_rest(case):
    ops, msgs = case

    async def run():
        c = AsyncFloClient(reader=None, writer=None)
        futs = {op: c._register(op) for op in ops}
        for m in msgs:
            c._dispatch(m)
        resolved = {op for op, f in futs.items() if f.done()}
        first_ack = {}
        for m in msgs:
            op = getattr(m, "op_id", None)
            if op in futs and op not in first_ack:
                first_ack[op] = m
        # every op with a matching message resolved with its FIRST match
        assert resolved == set(first_ack)
        for op, m in first_ack.items():
            assert futs[op].result() is m
        # everything else buffered, in arrival order
        expected_buffer = []
        seen = set()
        for m in msgs:
            op = getattr(m, "op_id", None)
            if op in futs and op not in seen:
                seen.add(op)
                continue
            expected_buffer.append(m)
        assert c._buffer == expected_buffer
        for f in futs.values():
            if not f.done():
                f.cancel()

    asyncio.run(run())
