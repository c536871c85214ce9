#!/usr/bin/env python3
"""Round-10 optimization measurement harness (guide §1.2 step 1).

Static plan audit over declared queries: per-table parquet scan
counts (the fork-rescan hazard), Exchange count, join strategies,
and Python-boundary nodes, from ``explain("formatted")``.  Writes
one summary line per entry; optionally dumps the formatted plan to
``plans/r10/<name>_<tag>.txt`` for the entries named on the CLI.

Usage:
  python plans/r10/audit_plans.py [--sf DIR] [--dump NAME ...] \
      [--tag before|after] [--only NAME ...]

NOTE: entries that localCheckpoint/persist eagerly execute those
stages at build time — run at a small SF unless measuring bench
scale.  Never run concurrently with pytest or bench.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(plan: str) -> dict:
    scans = Counter(re.findall(r"Location:.*?/(\w+)\.parquet", plan))
    return {
        "scans": dict(scans),
        "max_rescan": max(scans.values(), default=0),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnl": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cart": len(re.findall(r"CartesianProduct", plan)),
        "py": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas",
                plan,
            )
        ),
        "top": len(re.findall(r"TakeOrderedAndProject", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--dump", nargs="*", default=[])
    ap.add_argument("--tag", default="before")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from flo_spark.queries import queries
    from flo_spark.session import get_spark

    spark = get_spark("r10_plan_audit")
    qmap = queries()
    names = args.only if args.only else list(qmap)
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        try:
            df = qmap[name](spark, args.sf)
            plan = plan_of(df)
            s = summarize(plan)
            print(
                f"{name}\tmax_rescan={s['max_rescan']}\tscans={s['scans']}\t"
                f"ex={s['exchanges']}\tsmj={s['smj']}\tbhj={s['bhj']}\t"
                f"shj={s['shj']}\tbnl={s['bnl']}\tcart={s['cart']}\t"
                f"py={s['py']}\ttop={s['top']}",
                flush=True,
            )
            if name in args.dump:
                with open(f"{out_dir}/{name}_{args.tag}.txt", "w") as fh:
                    fh.write(plan)
        except Exception as e:  # streaming entries etc.
            print(f"{name}\tERROR\t{type(e).__name__}: {e}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
