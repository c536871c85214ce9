from flo_spark.plans.explain import (
    assert_no_cartesian,
    explain_str,
    pushed_filters,
    scan_columns,
    uses_broadcast_join,
)

__all__ = [
    "assert_no_cartesian",
    "explain_str",
    "pushed_filters",
    "scan_columns",
    "uses_broadcast_join",
]
