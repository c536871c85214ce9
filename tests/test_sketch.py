"""QuantileSketch invariants: exact weight conservation, the tracked
worst-case rank-error bound, merge associativity, and determinism —
property-tested over random data, chunkings, and merge orders."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flo_spark.operators.sketch import QuantileSketch


def _rank_of(sorted_vals: np.ndarray, v: float) -> tuple[int, int]:
    """Inclusive rank range of value v in the exact sorted data."""
    return (
        int(np.searchsorted(sorted_vals, v, side="left")),
        int(np.searchsorted(sorted_vals, v, side="right")),
    )


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=4000
    ),
    n_chunks=st.integers(1, 7),
    capacity=st.sampled_from([8, 32, 128]),
    seed=st.integers(0, 2**31),
)
def test_weight_conserved_and_rank_error_within_bound(
    data, n_chunks, capacity, seed
):
    rng = np.random.default_rng(seed)
    arr = np.array(data)
    bounds = np.sort(rng.choice(len(arr), size=min(n_chunks - 1, len(arr)), replace=False)) if n_chunks > 1 else []
    chunks = np.split(arr, bounds)
    sketches = [QuantileSketch(capacity).add(c) for c in chunks]
    rng.shuffle(sketches)
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.merge(s)

    assert merged.total_weight() == len(arr)  # exact weight conservation
    srt = np.sort(arr)
    n = len(arr)
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        est = merged.quantile(q)
        lo, hi = _rank_of(srt, est)
        target = q * n
        # the estimate's true rank range must overlap [target - B, target + B]
        b = merged.rank_error_bound
        assert lo - b <= target <= hi + b, (q, est, lo, hi, b, n)


def test_deterministic_across_runs():
    vals = np.sin(np.arange(5000) * 0.7) * 1000
    a = QuantileSketch(64).add(vals)
    b = QuantileSketch(64).add(vals)
    assert a.to_row() == b.to_row()
    assert a.quantile(0.5) == b.quantile(0.5)


def test_row_serialization_roundtrip():
    sk = QuantileSketch(16).add(np.arange(1000, dtype=float))
    levels, bound = sk.to_row()
    back = QuantileSketch.from_row(levels, bound, capacity=16)
    assert back.total_weight() == 1000
    assert back.quantile(0.25) == sk.quantile(0.25)


def test_exact_when_under_capacity():
    """No compaction ever fires below capacity: the sketch IS the data
    and every quantile is exact with bound 0."""
    vals = np.array([5.0, 1.0, 9.0, 3.0])
    sk = QuantileSketch(16).add(vals)
    assert sk.rank_error_bound == 0
    assert sk.quantile(0.0) == 1.0
    assert sk.quantile(0.5) == 3.0
    assert sk.quantile(1.0) == 9.0


# -- theta sketch ----------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    items=st.sets(st.integers(0, 10**9), min_size=0, max_size=2000),
    n_chunks=st.integers(1, 6),
    k=st.sampled_from([16, 64, 256]),
    seed=st.integers(0, 2**31),
)
def test_theta_state_independent_of_chunking_and_order(items, n_chunks, k, seed):
    from flo_spark.operators.sketch import ThetaSketch

    rng = np.random.default_rng(seed)
    arr = list(items)
    rng.shuffle(arr)
    bounds = sorted(rng.choice(len(arr), size=min(n_chunks - 1, len(arr)), replace=False)) if n_chunks > 1 and arr else []
    chunks = np.split(np.array(arr, dtype=object), bounds) if arr else [[]]
    merged = ThetaSketch(k)
    for c in chunks:
        merged.merge(ThetaSketch(k).add(list(c)))
    direct = ThetaSketch(k).add(items)
    assert merged.to_row() == direct.to_row()  # order/partitioning cancels
    if len(items) < k:
        assert merged.estimate() == len(items)  # exact below capacity


def test_theta_estimate_and_intersection_error_bounds():
    from flo_spark.operators.sketch import ThetaSketch

    k = 512
    a_items = [f"a{i}" for i in range(20000)] + [f"c{i}" for i in range(5000)]
    b_items = [f"b{i}" for i in range(10000)] + [f"c{i}" for i in range(5000)]
    a = ThetaSketch(k).add(a_items)
    b = ThetaSketch(k).add(b_items)
    rel = 4 / np.sqrt(k)  # ~4 standard errors
    assert abs(a.estimate() - 25000) <= rel * 25000
    assert abs(b.estimate() - 15000) <= rel * 15000
    inter = a.intersect_estimate(b)
    # intersection error scales with the UNION size at the common theta
    assert abs(inter - 5000) <= rel * 40000


def test_theta_exact_small_set_intersection():
    from flo_spark.operators.sketch import ThetaSketch

    a = ThetaSketch(64).add(["x", "y", "z", "w"])
    b = ThetaSketch(64).add(["y", "z", "q"])
    assert a.estimate() == 4 and b.estimate() == 3
    assert a.intersect_estimate(b) == 2.0  # both under capacity: exact


def test_theta_difference_exact_small_sets():
    from flo_spark.operators.sketch import ThetaSketch

    a = ThetaSketch(64).add(["x", "y", "z", "w"])
    b = ThetaSketch(64).add(["y", "z", "q"])
    assert a.difference_estimate(b) == 2.0  # {x, w}
    assert b.difference_estimate(a) == 1.0  # {q}


def test_theta_difference_error_bound_and_partition_identity():
    from flo_spark.operators.sketch import ThetaSketch

    k = 512
    a_items = [f"a{i}" for i in range(20000)] + [f"c{i}" for i in range(5000)]
    b_items = [f"b{i}" for i in range(10000)] + [f"c{i}" for i in range(5000)]
    a = ThetaSketch(k).add(a_items)
    b = ThetaSketch(k).add(b_items)
    rel = 4 / np.sqrt(k)
    diff = a.difference_estimate(b)
    # error scales with the union size at the common theta, like
    # intersection (same cut-sample argument)
    assert abs(diff - 20000) <= rel * 40000
    # partition identity: on the common-theta cut, A's retained points
    # split EXACTLY into common + only-A, so the two estimates sum to
    # the cut cardinality / theta
    th = min(a.theta(), b.theta())
    cut = int(th * a.MAX_HASH)
    n_cut = int((a._hashes < cut).sum())
    total = a.intersect_estimate(b) + diff
    assert abs(total - n_cut / th) < 1e-6
