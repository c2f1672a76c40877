"""Capture .explain("formatted") for the headline bench queries into
plans/r15/<query>_<tag>.txt (tag = before/after). Usage:

    python scripts/capture_plans.py <tag> [query ...]

Defaults to every HEADLINE query in bench.py. Runs with the bench's
cached-input protocol so the captured plans are the ones the bench
times (InMemoryTableScan leaves instead of parquet scans).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CUPLYR_BENCH_CACHED", "1")

import bench
import __spark_entry__ as entrymod
from cuplyr_spark.session import get_session


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(bench.HEADLINE)
    spark = get_session(app_name="cuplyr_plan_capture")
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_ROUND", "r16"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, bench.SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
