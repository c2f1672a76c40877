"""Benchmark harness (BASELINE.md protocol: warm-up run, then median
of N iterations per query) over $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total median sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Headline queries mirror the reference's benchmark suite
(``benchmark/benchmark.R:126-253``: group&summarise, 3-predicate
filter, complete workflow) plus this engine's scale-path operators
(multi-table join pipeline, minhash near-dup, cosine top-k).

Execution is measured with the noop sink — full plan runs on the
executors, nothing is collected to the driver (the reference times
GPU kernels excluding transfer; this is the Spark analog).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference protocol (BASELINE.md): timings exclude host<->device
# transfer -> inputs cached in memory, partitioned across cores.
os.environ.setdefault("CUPLYR_BENCH_CACHED", "1")

import __spark_entry__ as entrymod
from cuplyr_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("BENCH_ITERS", "9"))
WARMUPS = int(os.environ.get("BENCH_WARMUPS", "2"))

HEADLINE = [
    "group_summarise",       # reference: Group & Summarise
    "filter_select",         # reference: Filter (3 predicates)
    "workflow_complete",     # reference: Complete workflow
    "join_agg_pipeline",     # multi-table join + agg
    "arrange_topk",          # sort/top-k
    "window_topn_per_group", # window functions
    "minhash_signatures",    # near-dup signatures (text pipeline)
    "embedding_cosine_topk", # similarity search
    "text_quality",          # text analysis
    "tpch_q6",               # scan-filter-aggregate
    "tpch_q3",               # selective join + group + top-k
]


def execute(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_session(app_name="cuplyr_spark_bench")
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # Build the plan once, time executions only — the reference's
        # protocol times cuDF kernels, not R parsing; the analog here
        # is executor time, not Python plan construction.
        df = queries[name](spark, SF_DIR)
        for _ in range(WARMUPS):  # JIT, code cache, cache materialization
            execute(df)
        samples = [execute(df) for _ in range(ITERS)]
        # median of 9 shrugs off scheduler-jitter spikes (r1 recorded a
        # 9x outlier for minhash that no steady-state run reproduces)
        timings[name] = round(statistics.median(samples), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "median query latency over headline suite (noop sink)",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
