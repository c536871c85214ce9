"""VersionVector op library — mirrors the reference's unit tests
(flo-event/src/version_vec.rs:101-235) plus hypothesis property tests
and the Spark cursor hand-off."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flo_spark.version_vector import EventId, VersionVector

# reference tests use FloEventId::new(actor, counter)
eid = EventId.of


# -- direct ports of version_vec.rs:101-235 -------------------------------


def test_contains_true_when_counter_geq():
    vv = VersionVector()
    i = eid(3, 4)
    assert not vv.contains(i)
    vv.update_if_greater(i)
    assert vv.contains(i)
    assert vv.contains(eid(3, 3))


def test_min_returns_zero_when_empty():
    assert VersionVector().min() == EventId.zero()
    assert VersionVector().max() == EventId.zero()


def test_min_returns_smallest_value():
    vv = VersionVector()
    min_value = eid(9, 1)
    vv.update_if_greater(eid(5, 6))
    vv.update_if_greater(min_value)
    vv.update_if_greater(eid(4, 6))
    assert vv.min() == min_value  # counter-major ordering


def test_update_if_greater_only_advances():
    vv = VersionVector()
    vv.update_if_greater(eid(5, 6))
    assert vv.get(5) == 6
    vv.update_if_greater(eid(5, 4))
    assert vv.get(5) == 6
    vv.update_if_greater(eid(5, 7))
    assert vv.get(5) == 7


def test_from_vec_errors_on_duplicate_actor():
    with pytest.raises(ValueError):
        VersionVector.from_vec([eid(2, 3), eid(4, 5), eid(2, 2)])


def test_from_vec_roundtrip():
    vv = VersionVector.from_vec([eid(2, 3), eid(4, 5), eid(1, 2)])
    assert len(vv) == 3
    assert vv.get(2) == 3 and vv.get(4) == 5 and vv.get(1) == 2


def test_empty_snapshot_roundtrip():
    start = VersionVector()
    as_vec = start.snapshot()
    assert as_vec == []
    assert VersionVector.from_vec(as_vec) == start


def test_snapshot_returns_event_ids():
    vv = VersionVector()
    vv.update(eid(1, 4))
    vv.update(eid(2, 7))
    vv.update(eid(8, 5))
    vv.update(eid(8, 9))
    assert set(vv.snapshot()) == {eid(1, 4), eid(2, 7), eid(8, 9)}


def test_update_errors_when_counter_not_advancing():
    vv = VersionVector()
    vv.update(eid(4, 4))
    with pytest.raises(ValueError):
        vv.update(eid(4, 3))
    with pytest.raises(ValueError):
        vv.update(eid(4, 4))


def test_update_sets_counter_for_new_actor():
    vv = VersionVector()
    vv.update(eid(7, 9))
    assert vv.get(7) == 9
    vv.update(eid(7, 11))
    assert vv.get(7) == 11


def test_empty_get_returns_zero_for_any_actor():
    vv = VersionVector()
    for i in range(99):
        assert vv.get(i) == 0


# -- property tests -------------------------------------------------------

ids = st.builds(
    eid, st.integers(min_value=0, max_value=50), st.integers(min_value=1, max_value=10**6)
)


@settings(max_examples=200, deadline=None)
@given(st.lists(ids, max_size=60))
def test_update_if_greater_is_monotone_join(seq):
    """The vector is the pointwise max of everything merged in —
    update_if_greater is a commutative, idempotent join."""
    vv = VersionVector()
    for i in seq:
        vv.update_if_greater(i)
    expected = {}
    for i in seq:
        expected[i.actor] = max(expected.get(i.actor, 0), i.event_counter)
    assert dict(vv) == expected
    # idempotent: merging again changes nothing
    again = vv.copy()
    for i in seq:
        again.update_if_greater(i)
    assert again == vv
    # order-insensitive
    rev = VersionVector()
    for i in reversed(seq):
        rev.update_if_greater(i)
    assert rev == vv


@settings(max_examples=200, deadline=None)
@given(st.lists(ids, max_size=60))
def test_contains_iff_covered(seq):
    vv = VersionVector()
    for i in seq:
        vv.update_if_greater(i)
    for i in seq:
        assert vv.contains(i)
        assert not vv.contains(eid(i.actor, vv.get(i.actor) + 1))


@settings(max_examples=200, deadline=None)
@given(st.lists(ids, max_size=40))
def test_snapshot_from_vec_roundtrip(seq):
    vv = VersionVector()
    for i in seq:
        vv.update_if_greater(i)
    assert VersionVector.from_vec(vv.snapshot()) == vv
    if len(vv):
        assert vv.min() == min(vv.snapshot())
        assert vv.max() == max(vv.snapshot())


@settings(max_examples=100, deadline=None)
@given(st.lists(ids, min_size=1, max_size=60))
def test_update_accepts_exactly_strict_advance(seq):
    vv = VersionVector()
    for i in seq:
        cur = vv.get(i.actor)
        if i.event_counter > cur:
            vv.update(i)
            assert vv.get(i.actor) == i.event_counter
        else:
            with pytest.raises(ValueError):
                vv.update(i)
            assert vv.get(i.actor) == cur  # unchanged on rejection


# -- Spark cursor hand-off ------------------------------------------------


def test_advance_from_consumed_batch_and_resume(spark, tmp_path):
    """Consume -> advance cursor -> consume again resumes exactly after
    the last delivered id (sync/mod.rs:124-130 exclusive bound)."""
    from pyspark.sql import Row

    from flo_spark.sources.event_table import EventStream

    s = EventStream.create(spark, str(tmp_path / "vvh"), num_partitions=3)
    s.produce(
        spark.createDataFrame(
            [
                Row(namespace="/n", data=bytearray(b"x"), partition=(i % 3) + 1)
                for i in range(30)
            ]
        )
    )
    cursor = VersionVector.zero_for([1, 2, 3])
    first = s.consume(version_vector=cursor, limit=10)
    rows = first.collect()
    assert len(rows) == 10
    cursor.advance_from(first)
    # cursor now covers every delivered id and nothing beyond
    for r in rows:
        assert cursor.contains(EventId.of(r.actor, r.event_counter))
    rest = s.consume(version_vector=cursor).collect()
    assert len(rest) == 20
    seen = {(r.event_counter, r.actor) for r in rows}
    assert all((r.event_counter, r.actor) not in seen for r in rest)
    cursor.advance_from(s.consume(version_vector=cursor))
    assert s.consume(version_vector=cursor).count() == 0
    s.drop()
