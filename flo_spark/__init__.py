"""flo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of psFried/flo, re-expressed Spark-first.

The reference (flo) is a persistent event-stream server: produce events
into partitioned append-only logs, consume them back filtered by a
namespace glob, starting from a version-vector cursor, merged across
partitions in id order, with an optional limit and tail mode
(reference: flo-client-lib/src/async/mod.rs:103-121).

This package maps that model onto Spark (SURVEY.md §1.5):

- event            -> Row of EVENT_SCHEMA (flo_spark.schema)
- event stream     -> parquet table dir partitioned by `partition`
- version vector   -> per-partition exclusive lower-bound predicate
- namespace glob   -> rlike(glob_to_regex(pattern))
- consume          -> scan + vv filter + glob + orderBy(id) + limit
- tail             -> Structured Streaming (AvailableNow == await_new=False)

plus a batch-relational layer and LLM-data-pipeline operators
(dedup, similarity search, text analysis) designed for 100 TB scale.
"""

from flo_spark.schema import EVENT_SCHEMA
from flo_spark.functions.glob import GlobError, glob_to_regex, namespace_matches
from flo_spark.session import get_spark
from flo_spark.sources.event_table import EventStream, StreamRegistry
from flo_spark.sources.flo_datasource import FloDataSource
from flo_spark.sources.flo_datasource import register as register_flo_format
from flo_spark.sources.flo_segment import (
    expire_native_segments,
    native_head_status,
    read_flo_segments,
    tail_flo_segments,
    write_flo_segments,
)
from flo_spark.operators.sketch import (
    CountMinSketch,
    QuantileSketch,
    ThetaSketch,
)
from flo_spark.version_vector import EventId, VersionVector

__all__ = [
    "EVENT_SCHEMA",
    "EventId",
    "EventStream",
    "FloDataSource",
    "register_flo_format",
    "GlobError",
    "CountMinSketch",
    "QuantileSketch",
    "StreamRegistry",
    "ThetaSketch",
    "VersionVector",
    "expire_native_segments",
    "get_spark",
    "glob_to_regex",
    "namespace_matches",
    "native_head_status",
    "read_flo_segments",
    "tail_flo_segments",
    "write_flo_segments",
]

__version__ = "0.1.0"
