"""Pure-python model checks for the exact money-aggregation formulas
(flo_spark/queries.py::money_sum/money_avg and the scaled-long SQL
twins): against Decimal ground truth over random <=4-fractional-digit
values, the formulas must produce the exact half-up answer — the
property the whole q7-class fix rests on."""

import math
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

# values like the testdata's money columns: <=4 fractional digits,
# magnitudes up to ~1e5, negatives allowed (acctbal)
_money = st.integers(-10**9, 10**9).map(lambda n: n / 10**4)


def _scaled(x: float) -> int:
    """floor(x*1e4 + 0.5) — the Spark/DuckDB expression, in python."""
    return math.floor(x * 10000 + 0.5)


def _money_sum(xs) -> float:
    s = sum(_scaled(x) for x in xs)
    return math.floor((s + 50) / 100.0) / 100.0


def _money_avg(xs) -> float:
    s = float(sum(_scaled(x) for x in xs))
    return math.floor(s / len(xs) + 0.5) / 10000.0


def _half_up_ceiling(x: Decimal, digits: int) -> Decimal:
    """round-half-toward-+infinity at `digits` decimals — the
    convention floor(x*10^d + 0.5) implements identically in Spark and
    DuckDB (for positives it equals ordinary half-up; negative halves
    round toward zero... toward +inf)."""
    q = Decimal(10) ** -digits
    scaled = x / q
    return (scaled + Decimal("0.5")).to_integral_value(rounding="ROUND_FLOOR") * q


@settings(max_examples=500, deadline=None)
@given(xs=st.lists(_money, min_size=1, max_size=200))
def test_money_sum_matches_decimal_half_up(xs):
    exact = sum(Decimal(repr(v)) for v in xs)  # inputs are exact 4dp
    want = float(_half_up_ceiling(exact, 2))
    assert _money_sum(xs) == want


@settings(max_examples=500, deadline=None)
@given(xs=st.lists(_money, min_size=1, max_size=200))
def test_money_sum_is_order_insensitive(xs):
    assert _money_sum(xs) == _money_sum(list(reversed(xs)))
    assert _money_sum(xs) == _money_sum(sorted(xs))


@settings(max_examples=300, deadline=None)
@given(xs=st.lists(_money, min_size=1, max_size=200))
def test_money_avg_matches_decimal_half_up(xs):
    exact = sum(Decimal(repr(v)) for v in xs) / len(xs)
    want = float(_half_up_ceiling(exact, 4))
    # the formula computes s/n in DOUBLE; at a .xxxx5 boundary the
    # double quotient may sit one ulp off the exact Decimal quotient,
    # flipping the floor — both engines compute the SAME double, so
    # cross-engine identity (the property that matters) still holds;
    # tolerate the one-grid-step deviation only exactly at a boundary
    got = _money_avg(xs)
    if got != float(want):
        s = sum(_scaled(v) for v in xs)
        boundary = (Decimal(s) / len(xs)) % 1 == Decimal("0.5")
        assert boundary and abs(got - float(want)) <= 1e-4, (got, want)
