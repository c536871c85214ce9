"""Physical-plan inspection helpers.

flo's "optimizer" is an index seek + scan-time filter
(SURVEY.md §4); on Spark the equivalents are parquet predicate
pushdown, column pruning, and broadcast joins — all visible in the
formatted physical plan.  These helpers let tests assert the plan we
want, not just the answer we want:

- filters reached the scan        -> pushed_filters()
- scan reads only needed columns  -> scan_columns()
- small dims broadcast            -> uses_broadcast_join()
- no accidental cross join        -> assert_no_cartesian()
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[set[str]]:
    """ReadSchema column sets, one per file scan (column pruning check)."""
    plan = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        }
        out.append(cols)
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    if "CartesianProduct" in plan:
        raise AssertionError("plan contains CartesianProduct:\n" + plan)
