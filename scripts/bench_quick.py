"""Targeted micro-bench for optimization iteration: time a subset of
bench.py HEADLINE queries (noop sink, same protocol: warmups then
median of iters), optionally with extra session conf overrides.

Usage:
    python scripts/bench_quick.py q1 q2 ...            # default 2+5
    BQ_WARMUPS=2 BQ_ITERS=7 python scripts/bench_quick.py tpch_q3
    BQ_CONF="spark.sql.join.preferSortMergeJoin=false;..." \
        python scripts/bench_quick.py tpch_q3 tpch_q9
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CUPLYR_BENCH_CACHED", "1")

import bench
import __spark_entry__ as entrymod
from cuplyr_spark.session import get_session


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    warmups = int(os.environ.get("BQ_WARMUPS", "2"))
    iters = int(os.environ.get("BQ_ITERS", "5"))
    conf = {}
    for kv in os.environ.get("BQ_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf[k.strip()] = v.strip()
    spark = get_session(app_name="cuplyr_bench_quick", extra_conf=conf)
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)  # runtime-settable confs apply even on
        except Exception:  # a reused session; static ones need fresh JVM
            print(f"# conf {k} not runtime-settable", file=sys.stderr)
    qs = entrymod.queries()
    plans = {n: qs[n](spark, bench.SF_DIR) for n in names}
    out = {}
    for n in names:
        for _ in range(warmups):
            bench.execute(plans[n])
        samples = [bench.execute(plans[n]) for _ in range(iters)]
        out[n] = {
            "median": round(statistics.median(samples), 4),
            "min": round(min(samples), 4),
            "samples": [round(s, 4) for s in samples],
        }
        print(f"{n}: median={out[n]['median']} min={out[n]['min']}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
