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
        return f"{v:.6g}"
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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = sdf.collect()

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sc = _canon_rows(scols, [[r[c] for c in sdf.columns] for r in srows])
    dc = _canon_rows(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b]
    assert not mism, f"{name}: first mismatch row {mism[0]}: {sc[mism[0]]} vs {dc[mism[0]]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
