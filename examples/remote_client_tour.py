"""Remote-protocol tour — flo over a real TCP socket, no embedded
session required on the client side:

    serve a native data dir -> sync client produce/consume ->
    ASYNC client pipelined produce_all -> produce WHILE a live
    consume runs on the same socket -> Spark format("flo") scan of
    everything the server persisted

Usage:
    python examples/remote_client_tour.py [WORKDIR]
"""

import asyncio
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync_leg(host: str, port: int) -> None:
    from flo_spark.protocol.client import FloClient

    with FloClient(host, port, client_name="tour-sync") as c:
        ids = c.produce_many(
            [(1, f"/sync/{i}", f"s{i}".encode()) for i in range(4)]
        )
        print(f"sync: produced {len(ids)} events, ids "
              f"{ids[0].counter}..{ids[-1].counter} on partition 1")
        got = list(c.consume(namespace="/sync/*", version_vector={1: 0}))
        print(f"sync: consumed {len(got)} events back via credit flow")


async def async_leg(host: str, port: int) -> None:
    from flo_spark.protocol.async_client import AsyncFloClient

    async with await AsyncFloClient.connect(
        host, port, client_name="tour-async"
    ) as c:
        ids = await c.produce_all(
            [(1, f"/async/{i}", f"a{i}".encode()) for i in range(4)]
        )
        print(f"async: pipelined batch acked {len(ids)} ids in one round trip")
        got, pending = [], []
        async for ev in c.consume(
            namespace="/async/*", version_vector={1: 0}, await_new=True
        ):
            got.append(ev)
            if len(got) == 2:
                # the signature move: produce while the cursor is live
                pending.append(c.produce_nowait(1, "/async/live", b"mid"))
            if len(got) == 5:
                break
        mid = await pending[0]
        print(
            f"async: consumed {len(got)} events; event {mid.counter} was "
            "produced MID-CONSUME on the same socket and arrived through "
            "the live cursor"
        )
        await c.stop_consuming()


def main(workdir: str) -> None:
    from flo_spark.protocol.server import FloTcpServer

    data_dir = os.path.join(workdir, "flo_data")
    with FloTcpServer(data_dir) as srv:
        print(f"server: listening on {srv.host}:{srv.port}, data {data_dir}")
        sync_leg(srv.host, srv.port)
        asyncio.run(async_leg(srv.host, srv.port))

    import flo_spark as fs

    spark = fs.get_spark("remote-client-tour")
    from flo_spark.sources.flo_datasource import register

    register(spark)
    df = spark.read.format("flo").load(os.path.join(data_dir, "default"))
    n = df.count()
    print(f"format('flo') scan sees {n} events persisted by the server")
    spark.stop()


if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp("remote_tour")
    main(wd)
