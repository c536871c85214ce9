"""Pin the driver's positional 50-key correctness window.

The driver hashes only the first 50 ``queries()`` keys (see
DRIVER_COVERAGE.md); these assertions keep that window deliberate —
a refactor that perturbs registration order or drops an oracle would
otherwise silently change which components get driver-verified.
"""

from flo_spark import queries as q


def test_window_is_fifty_unique_registered_keys():
    order = q.DRIVER_CHECK_ORDER
    assert len(order) == 50
    assert len(set(order)) == 50
    missing = [n for n in order if n not in q.REGISTRY]
    assert not missing, missing


def test_queries_lead_with_window_and_keep_full_catalog():
    keys = list(q.queries().keys())
    assert keys[:50] == q.DRIVER_CHECK_ORDER
    assert set(keys) == set(q.REGISTRY)  # nothing dropped by reordering


def test_every_window_entry_is_hash_checkable():
    osql = q.oracle_sql()
    rows_only = [n for n in q.DRIVER_CHECK_ORDER if n not in osql]
    assert not rows_only, f"window entries without an oracle: {rows_only}"
