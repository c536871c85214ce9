"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables; compare row count, column names, and
order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # Full precision (shortest round-trip repr, unique per bit
        # pattern).  The old ``%.6g`` canonicalization collapsed
        # 536532.32 and 536532.31 to "536532" and let the q7 one-cent
        # rounding flip ship in round 5 while the driver (which
        # compares full values) failed it.  Entries whose contract is
        # approximate must round identically on BOTH engines instead
        # of relying on a lossy comparison here.
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):
        try:
            return v.isoformat(sep=" ", timespec="microseconds")  # datetime
        except TypeError:
            return v.isoformat()  # date
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(_canon(vals[i]) for i in order))
    return sorted(out)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _dtype_kind(dtype):
    """Collapse a pandas dtype to 'i' (integer), 'f' (float), or 'o'.

    The driver fetches DuckDB results via ``.df()`` (pandas), where a
    HUGEINT aggregate (DuckDB's sum(BIGINT) result type) degrades to
    float64 and breaks its value canonicalization even when every value
    is integral.  Comparing dtype kinds here reproduces that failure
    locally — CORRECTNESS_r01's three hash mismatches never failed the
    old fetchall()-based replica because fetchall yields Python ints."""
    k = getattr(dtype, "kind", "o")
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    return "o"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spd = sdf.toPandas()
    spd.columns = [c.lower() for c in spd.columns]
    scols = list(spd.columns)

    con = _duck(sf_dir)
    dpd = con.execute(ORACLES[name]).df()
    con.close()
    dpd.columns = [c.lower() for c in dpd.columns]
    dcols = list(dpd.columns)

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(spd) == len(dpd), f"{name}: row count {len(spd)} != {len(dpd)}"

    # Only flag int-vs-float divergence when the column has no nulls;
    # nullable int columns legitimately surface as float64 on either side.
    for c in scols:
        sk, dk = _dtype_kind(spd[c].dtype), _dtype_kind(dpd[c].dtype)
        if {sk, dk} == {"i", "f"} and not (
            spd[c].isna().any() or dpd[c].isna().any()
        ):
            raise AssertionError(
                f"{name}.{c}: dtype kind {sk} (spark) != {dk} (duckdb) — "
                "likely an uncast DuckDB HUGEINT sum; wrap the oracle "
                "aggregate in CAST(... AS BIGINT)"
            )

    sc = _canon_rows(scols, spd.itertuples(index=False, name=None))
    dc = _canon_rows(dcols, dpd.itertuples(index=False, name=None))
    mism = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b]
    assert not mism, f"{name}: first mismatch row {mism[0]}: {sc[mism[0]]} vs {dc[mism[0]]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
