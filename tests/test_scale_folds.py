"""Mechanism tests for the round-9 scale-hazard restructurings.

Two catalog entries replaced unbounded aggregation buffers with
bounded/parallel constructions whose VALUES must stay exactly what a
sequential single-machine replay produces:

* ``_hourly_tree_digest`` (audit_hash_chain / merkle_tree_proof): the
  bounded three-stage md5 tree over (hour, event_id div 64,
  event_id div 4096) must equal a straight-line Python replay of the
  same fold, stay order-sensitive, and detect any single-field tamper.
* ``lindley_queue_replay``: the parallel-scan closed form
  W_k = q_k - min_{j<=k} q_j (q_k = 400k - t_k) must equal the
  textbook sequential recursion W_{k+1} = max(0, W_k + S - A_{k+1}).

Both references are implemented here independently (pure Python), so
a future edit to either engine-side program that changes semantics
fails loudly without needing the DuckDB oracle.
"""

import hashlib
from datetime import datetime, timedelta

import pytest


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _ref_tree_digest(rows):
    """Sequential replay of the bounded tree digest: per hour, md5
    64-id chunks in event_id order, md5 runs of 64 chunk digests,
    md5 the superchunk digests."""
    by_hour = {}
    for eid, ts, uid, etype in rows:
        hour = ts.replace(minute=0, second=0, microsecond=0)
        by_hour.setdefault(hour, []).append((eid, uid, etype))
    out = {}
    for hour, evs in by_hour.items():
        chunks = {}
        for eid, uid, etype in sorted(evs):
            chunks.setdefault(eid // 64, []).append(f"{eid}|{uid}|{etype}")
        sup = {}
        for c in sorted(chunks):
            d = hashlib.md5("".join(chunks[c]).encode()).hexdigest()
            sup.setdefault(c // 64, []).append(d)
        tops = [
            hashlib.md5("".join(sup[s]).encode()).hexdigest()
            for s in sorted(sup)
        ]
        out[hour] = hashlib.md5("".join(tops).encode()).hexdigest()
    return out


def _digest_rows(spark, rows):
    from pyspark.sql import functions as F

    from flo_spark.queries_ext.flo_surface import _hourly_tree_digest

    line = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
    )
    got = _hourly_tree_digest(_mk_events(spark, rows), line).collect()
    return {r["bucket"]: r["digest"] for r in got}


# ids crafted to cross chunk (64) and superchunk (4096) boundaries
# inside single hours, plus an hour with one lonely event
_T0 = datetime(2024, 3, 1, 10, 0, 0)
_ROWS = (
    [(i, _T0 + timedelta(seconds=i), i % 7, f"t{i % 3}") for i in range(60, 70)]
    + [(i, _T0 + timedelta(minutes=30), 5, "x") for i in (4090, 4095, 4096, 4100)]
    + [(500, _T0 + timedelta(hours=2), 1, "solo")]
    + [(i, _T0 + timedelta(hours=3, seconds=i), i, "y") for i in range(128, 200)]
)


def test_tree_digest_matches_sequential_reference(spark):
    assert _digest_rows(spark, _ROWS) == _ref_tree_digest(_ROWS)


def test_tree_digest_detects_single_field_tamper(spark):
    base = _digest_rows(spark, _ROWS)
    tampered = list(_ROWS)
    eid, ts, uid, etype = tampered[3]
    tampered[3] = (eid, ts, uid + 1, etype)
    got = _digest_rows(spark, tampered)
    hour = ts.replace(minute=0, second=0, microsecond=0)
    assert got[hour] != base[hour]
    assert {h: d for h, d in got.items() if h != hour} == {
        h: d for h, d in base.items() if h != hour
    }


def test_tree_digest_is_order_sensitive(spark):
    """Swapping two events' ids (same content set, different id
    order) must change the digest — the property a commutative
    map-side combine would lose."""
    base = _digest_rows(spark, _ROWS)
    swapped = list(_ROWS)
    (e0, t0_, u0, y0), (e1, t1, u1, y1) = swapped[0], swapped[1]
    swapped[0], swapped[1] = (e1, t0_, u0, y0), (e0, t1, u1, y1)
    assert _digest_rows(spark, swapped) != base


def _ref_lindley(ts_ms, service=400):
    w, mx = 0, 0
    for gap in (b - a for a, b in zip(ts_ms, ts_ms[1:])):
        w = max(0, w + service - gap)
        mx = max(mx, w)
    return len(ts_ms), w, mx


@pytest.mark.parametrize(
    "gaps",
    [
        [100, 100, 100, 100],           # sustained overload
        [1000, 1000, 1000],             # always idle
        [50, 50, 5000, 50, 50, 10_000], # bursts with resets
        [400, 400, 400, 399, 401],      # boundary gaps
        [],                             # single job
    ],
)
def test_lindley_closed_form_matches_sequential_replay(spark, tmp_path, gaps):
    from flo_spark.queries_ext.streaming import lindley_queue_replay

    t, ts_ms = 1_700_000_000_000, []
    for g in [0] + gaps:
        t += g
        ts_ms.append(t)
    epoch = datetime(1970, 1, 1)
    rows = [
        (i, epoch + timedelta(milliseconds=ms), i, "e")
        for i, ms in enumerate(ts_ms)
    ]
    path = str(tmp_path / "events.parquet")
    _mk_events(spark, rows).write.mode("overwrite").parquet(path)
    # lindley loads <sf_dir>/events.parquet through queries.load
    got = lindley_queue_replay(spark, str(tmp_path)).collect()[0]
    n, final_w, max_w = _ref_lindley(ts_ms)
    assert (got["n_jobs"], got["final_wait_ms"], got["max_wait_ms"]) == (
        n,
        final_w,
        max_w,
    )


def test_tree_digest_property_random_layouts(spark):
    """Randomized layouts (duplicate-free ids in arbitrary hour
    placements, including chunk/superchunk boundary straddles) must
    all match the sequential reference — pins the grouping keys, the
    sort keys, and the md5 composition against layout assumptions."""
    import random

    rng = random.Random(0xF10)
    for trial in range(6):
        n = rng.randint(1, 80)
        ids = rng.sample(range(0, 10000), n)
        rows = [
            (
                eid,
                _T0 + timedelta(
                    hours=rng.randint(0, 5), seconds=rng.randint(0, 3599)
                ),
                rng.randint(0, 9),
                rng.choice(["a", "b", "c"]),
            )
            for eid in ids
        ]
        assert _digest_rows(spark, rows) == _ref_tree_digest(rows), (
            trial,
            n,
        )
