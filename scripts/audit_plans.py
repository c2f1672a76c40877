"""Physical-plan audit over every contract query: join strategies,
exchange counts, scan pushdown. The 'would this survive 100 TB' check
(red flags: CartesianProduct where unintended, SortMergeJoin where a
dim should broadcast, filters not reaching the scan).

Usage: python scripts/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cuplyr_spark.session import get_session

MARKERS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "TakeOrderedAndProject",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="plan_audit")
    for name, fn in entrymod.queries().items():
        if name.startswith("streaming_"):
            print(f"{name:28s} (streaming — skipped)")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            print(f"{name:28s} ERROR {str(e)[:80]}")
            continue
        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        joins = [m for m in MARKERS if m in plan]
        pushed = "PushedFilters: [" in plan and not re.search(
            r"PushedFilters: \[\]", plan
        )
        print(
            f"{name:28s} exchanges={n_exchange:2d} "
            f"pushdown={'y' if pushed else '-'} {' '.join(joins)}"
        )


if __name__ == "__main__":
    main()
