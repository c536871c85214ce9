"""flo event-store tour — every day-one operation a flo user runs,
against the engine's embedded store:

    create stream -> produce (acked id ranges) -> consume with
    namespace glob + version vector -> head status -> export to a
    native flo data dir -> scan it back as format("flo")

Usage:
    python examples/event_store_tour.py [WORKDIR]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir: str) -> None:
    from pyspark.sql import Row

    import flo_spark as fs

    spark = fs.get_spark("event-store-tour")
    s = fs.EventStream.create(
        spark, os.path.join(workdir, "stream"), num_partitions=2
    )

    batch = spark.createDataFrame(
        [
            Row(
                namespace=f"/orders/{region}/created",
                data=bytearray(f'{{"id": {i}}}', "utf8"),
                partition=(i % 2) + 1,
            )
            for i, region in enumerate(["eu", "us", "eu", "apac", "us", "eu"])
        ]
    )
    ack = s.produce(batch)
    print("produced; acked id ranges per partition:", ack.ranges)

    got = s.consume(namespace="/orders/eu/**", version_vector={1: 0, 2: 0})
    print("eu events in global (counter, actor) order:")
    for e in got.collect():
        print(f"  {e.event_counter}.{e.partition}  {e.namespace}")

    print("head status:", s.head())

    native = os.path.join(workdir, "native")
    s.export_native(native)
    from flo_spark.sources.flo_datasource import register

    register(spark)
    n = spark.read.format("flo").load(native).count()
    print(f"native export at {native}: format('flo') scan sees {n} events")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp())
