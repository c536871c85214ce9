"""CountMinSketch (operators/sketch.py): one-sided error, exact
multiset-function state (order/partition/merge independence), weighted
adds, serialization, and the statistical eps*N bound."""

from collections import Counter

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flo_spark.operators.sketch import CountMinSketch


def _items(seed=0, n=5000, keys=200):
    rng = np.random.default_rng(seed)
    return [f"k{i}" for i in rng.integers(0, keys, n)]


def test_overestimate_only():
    items = _items()
    sk = CountMinSketch(512, 4).add(items)
    exact = Counter(items)
    for k, v in exact.items():
        assert sk.estimate(k) >= v
    # an absent key may still collide, but never goes negative
    assert sk.estimate("never-seen") >= 0
    assert sk.total == len(items)


def test_state_is_multiset_function():
    items = _items(seed=3)
    direct = CountMinSketch(256, 3).add(items)
    # chunked + merged in a different order
    chunks = [items[i::7] for i in range(7)]
    parts = [CountMinSketch(256, 3).add(c) for c in chunks]
    merged = parts[3]
    for p in parts[4:] + parts[:3]:
        merged.merge(p)
    assert np.array_equal(merged.table, direct.table)
    assert merged.total == direct.total
    # shuffled insertion order
    rng = np.random.default_rng(5)
    shuffled = list(items)
    rng.shuffle(shuffled)
    assert np.array_equal(
        CountMinSketch(256, 3).add(shuffled).table, direct.table
    )


def test_weighted_add_equals_repeats():
    keys = ["a", "b", "c"]
    w = [5, 1, 3]
    weighted = CountMinSketch(64, 2).add(keys, w)
    repeated = CountMinSketch(64, 2).add(
        [k for k, n in zip(keys, w) for _ in range(n)]
    )
    assert np.array_equal(weighted.table, repeated.table)
    assert weighted.total == repeated.total == 9


def test_row_roundtrip_and_shape_check():
    sk = CountMinSketch(128, 3).add(_items(seed=9, n=500))
    cells, total = sk.to_row()
    back = CountMinSketch.from_row(cells, total, 128, 3)
    assert np.array_equal(back.table, sk.table)
    assert back.total == sk.total
    with pytest.raises(ValueError):
        CountMinSketch.from_row(cells, total, 64, 3)
    with pytest.raises(ValueError):
        CountMinSketch(128, 3).merge(CountMinSketch(64, 3))


def test_negative_weights_rejected():
    with pytest.raises(ValueError):
        CountMinSketch().add(["x"], [-1])


def test_eps_n_bound_statistical():
    # eps = e / width; with depth 4 the failure probability per query
    # is e^-4 ~ 1.8% — check across many keys that violations are rare
    items = _items(seed=11, n=20000, keys=1000)
    width = 256
    sk = CountMinSketch(width, 4).add(items)
    exact = Counter(items)
    bound = np.e / width * sk.total
    viol = sum(1 for k, v in exact.items() if sk.estimate(k) > v + bound)
    assert viol <= 0.05 * len(exact)


def test_estimate_many_matches_single():
    items = _items(seed=13, n=2000, keys=50)
    sk = CountMinSketch(128, 4).add(items)
    keys = sorted(Counter(items))
    many = sk.estimate_many(keys)
    assert list(many) == [sk.estimate(k) for k in keys]
    assert sk.estimate_many([]).size == 0


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=6), min_size=0, max_size=200))
def test_merge_associativity_property(vals):
    a, b, c = vals[::3], vals[1::3], vals[2::3]
    left = (
        CountMinSketch(64, 2)
        .add(a)
        .merge(CountMinSketch(64, 2).add(b))
        .merge(CountMinSketch(64, 2).add(c))
    )
    right = CountMinSketch(64, 2).add(b)
    right.merge(CountMinSketch(64, 2).add(c))
    right = CountMinSketch(64, 2).add(a).merge(right)
    assert np.array_equal(left.table, right.table)
    assert left.total == right.total == len(vals)
