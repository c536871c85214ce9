"""Schema-drift tripwire for the driver-generated testdata.

The testdata directory is regenerated between rounds and its physical
encodings have already changed once (events.ts went from
TIMESTAMP(NANOS) to TIMESTAMP_MICROS/isAdjustedToUTC=0, silently
breaking six queries).  This test pins the logical schema of every
table — and the SET of accepted physical encodings for events.ts — so
the next silent regeneration fails here in seconds with a readable
message instead of as a pile of oracle mismatches.

Runs on pyarrow only (no Spark session) so it is fast enough to sit
first in the suite.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

# events.ts encodings load()/_events_stream are written to handle.
# If this assertion fires, extend flo_spark.queries.load AND
# flo_spark.queries._events_stream for the new encoding, then add it.
ACCEPTED_TS_TYPES = {
    "timestamp[ns]",  # TIMESTAMP(NANOS): Spark reads ns-as-long
    "timestamp[us]",  # TIMESTAMP_MICROS ntz: Spark reads TIMESTAMP_NTZ
    "timestamp[us, tz=UTC]",  # TIMESTAMP_MICROS utc: Spark TIMESTAMP
}

EXPECTED_COLUMNS = {
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_encoding_is_handled(sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    ts_type = str(schema.field("ts").type)
    assert ts_type in ACCEPTED_TS_TYPES, (
        f"{path}: events.ts is now {ts_type!r}, which load()/_events_stream "
        f"do not handle (accepted: {sorted(ACCEPTED_TS_TYPES)}). The driver "
        "regenerated testdata with a new timestamp encoding — extend the "
        "dtype branches in flo_spark/queries.py before trusting any oracle "
        "result involving events."
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_table_columns_stable(sf_dir):
    for table, cols in EXPECTED_COLUMNS.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            pytest.skip(f"{path} absent")
        schema = pq.read_schema(path)
        if cols is not None:
            assert schema.names == cols, (
                f"{path}: columns changed: {schema.names} != {cols}"
            )
        else:
            assert len(schema.names) > 0, f"{path}: empty schema"


def test_documents_and_embeddings_minimum_surface():
    """The LLM-pipeline operators key on these columns by name."""
    sf = SF_DIRS[0] if SF_DIRS else None
    if sf is None:
        pytest.skip("no testdata")
    docs = pq.read_schema(os.path.join(sf, "documents.parquet"))
    for col in ("doc_id", "text"):
        assert col in docs.names, f"documents.parquet lost column {col!r}"
    emb = pq.read_schema(os.path.join(sf, "embeddings.parquet"))
    assert any(c in emb.names for c in ("vec_id", "doc_id", "id")), emb.names
    assert any("embedding" in c or "vec" in c for c in emb.names), emb.names
