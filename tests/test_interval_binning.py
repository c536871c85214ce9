"""The interval-join binning rewrite's correctness hinges on one
invariant: every point inside [lo, hi) has its bin inside the band's
exploded bin range [lo div W, hi div W].  If that ever failed, the
equi-join would silently DROP a matching (point, interval) pair — the
worst failure mode, invisible to row counts.  Property-test it over
adversarial floats and widths, plus the exactly-once guarantee (a
matching pair appears in exactly one bin)."""

import math

from hypothesis import example, given, settings
from hypothesis import strategies as st


@given(
    lo=st.integers(0, 10**9),
    span=st.integers(1, 10**9),
    w=st.sampled_from([1, 7, 1000, 50000, 2**31]),
    frac=st.floats(0.0, 1.0, exclude_max=True, allow_nan=False),
)
def test_matching_point_bin_is_always_covered(lo, span, w, frac):
    hi = lo + span
    p = lo + frac * span  # a point guaranteed inside [lo, hi)
    if not (lo <= p < hi):  # float rounding can push p to hi; skip
        return
    bin_p = math.floor(p / w)
    assert lo // w <= bin_p <= hi // w, (lo, hi, w, p, bin_p)


@given(
    lo=st.integers(0, 10**6),
    span=st.integers(1, 10**6),
    w=st.sampled_from([1, 7, 1000, 50000]),
    frac=st.floats(0.0, 1.0, exclude_max=True, allow_nan=False),
)
@example(lo=393535, span=602894, w=1, frac=0.18282815208850933)
@settings(deadline=None)  # w=1 cases are large; load spikes broke 200ms
def test_matching_pair_survives_exactly_once(lo, span, w, frac):
    """A point lies in exactly ONE bin, so after the equi-join +
    re-check each matching pair appears exactly once — no dedup step
    needed (the entry relies on this).

    The exploded bins are range(lo//w, hi//w + 1) — distinct by
    construction — so "exactly once" reduces to: the point's single
    bin floor(p/w) is a member (O(1) range membership; a materialized
    list scan here is O(span) per example and deadline-flaky)."""
    hi = lo + span
    p = lo + frac * span
    if not (lo <= p < hi):
        return
    bins = range(lo // w, hi // w + 1)
    assert math.floor(p / w) in bins
