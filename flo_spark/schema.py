"""Event envelope schema — the single fundamental record type.

Mirrors flo's ``FloEvent`` (reference: flo-event/src/lib.rs:187-217,
OwnedFloEvent :252-258):

- id        = (event_counter: u64, actor: u16)  -- total order is
              (counter, actor), reference flo-event/src/lib.rs:164-172
- parent_id = optional causal pointer (lib.rs:192-196)
- timestamp = server-assigned, ms precision, NOT monotonic (lib.rs:51-53)
- namespace = utf-8 path-like string, '/'-separated (README.md:103)
- data      = opaque bytes payload (lib.rs:201-204)

We flatten the two-field ids into columns so Catalyst can push
predicates into the parquet scan (a struct comparison would not prune
row groups).  ``partition`` is the flo ActorId that owns the event —
kept as an explicit column AND as the physical partition directory so
partition pruning applies to version-vector reads.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: flo ActorId is u16; event_counter is u64 (we use signed 64-bit, ample).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_counter", T.LongType(), nullable=False),
        T.StructField("actor", T.IntegerType(), nullable=False),
        T.StructField("parent_counter", T.LongType(), nullable=True),
        T.StructField("parent_actor", T.IntegerType(), nullable=True),
        T.StructField("timestamp", T.TimestampType(), nullable=False),
        T.StructField("namespace", T.StringType(), nullable=False),
        T.StructField("data", T.BinaryType(), nullable=True),
        # physical partition (== actor in flo; duplicated for dir layout)
        T.StructField("partition", T.IntegerType(), nullable=False),
    ]
)

#: Columns that constitute the event id, in total-order position.
ID_ORDER = ["event_counter", "actor"]

#: Default stream options, mirroring flo's EventStreamOptions defaults
#: (flo-server/src/engine/event_stream/mod.rs:27-37).
DEFAULT_NUM_PARTITIONS = 1
DEFAULT_SEGMENT_MAX_RECORDS = 1_000_000  # rotation analog of 1 GiB segments
