"""Property tests for the greedy sequence-packing fold (pure, no Spark)."""

from hypothesis import given
from hypothesis import strategies as st

from flo_spark.functions.packing import greedy_pack

TARGET = 2048

counts = st.lists(st.integers(min_value=1, max_value=3000), max_size=200)


@given(counts)
def test_every_input_assigned_monotonically(ns):
    out = greedy_pack(ns, TARGET)
    assert len(out) == len(ns)
    # sequence ids start at 0 and only ever step by 0 or +1
    if out:
        assert out[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(out, out[1:]))


@given(counts)
def test_multi_doc_sequences_fit_target(ns):
    out = greedy_pack(ns, TARGET)
    fills: dict[int, list[int]] = {}
    for n, s in zip(ns, out):
        fills.setdefault(s, []).append(n)
    for members in fills.values():
        # a sequence only exceeds the target when a single oversized
        # document occupies it alone
        if len(members) > 1:
            assert sum(members) <= TARGET


@given(counts)
def test_packing_is_greedy_tight(ns):
    # whenever a new sequence starts, the previous one could not have
    # held the first document of the new sequence
    out = greedy_pack(ns, TARGET)
    fills: dict[int, int] = {}
    for n, s in zip(ns, out):
        if s not in fills:
            if s > 0:
                assert fills[s - 1] + n > TARGET
            fills[s] = n
        else:
            fills[s] += n


def test_empty_and_oversized():
    assert greedy_pack([], TARGET) == []
    assert greedy_pack([5000], TARGET) == [0]
    assert greedy_pack([5000, 1], TARGET) == [0, 1]
    assert greedy_pack([1, 5000, 1], TARGET) == [0, 1, 2]
