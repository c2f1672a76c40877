"""Pin the tpch_q6 wall-time BAND on this VM (VERDICT r12 "what's
wrong" #1): q6's code is byte-identical since r9, yet round artifacts
read 0.083 s (r11) → 0.182 s (r12 driver) and earlier 0.121 s (r9) —
two rounds of "noise" adjudications without a recorded distribution.

Method (the interleaved same-process protocol BENCH_DELTA r12
established): one session, plan built once, then K temporally
separated blocks of N noop-sink executions each, a calibration
microbench sample between blocks. Reports per-block medians,
whole-run min/median/max, and the calibration constant — the band a
future verdict can test a driver reading against instead of
re-adjudicating.

    python scripts/pin_q6_band.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault("CUPLYR_BENCH_CACHED", "1")

import __spark_entry__ as entrymod  # noqa: E402
from bench import calibrate, execute  # noqa: E402
from cuplyr_spark.session import get_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="q6_band")
    plan = entrymod.queries()["tpch_q6"](spark, sf_dir)
    for _ in range(3):
        execute(plan)  # warm-up
    blocks, cals = [], []
    for b in range(5):
        cals.append(calibrate()["sec"])
        samples = [execute(plan) for _ in range(9)]
        blocks.append(
            {
                "median": round(statistics.median(samples), 4),
                "min": round(min(samples), 4),
                "max": round(max(samples), 4),
            }
        )
        time.sleep(2)
    all_medians = [b["median"] for b in blocks]
    print(
        json.dumps(
            {
                "query": "tpch_q6",
                "sf_dir": sf_dir,
                "blocks": blocks,
                "band_min": min(all_medians),
                "band_median": round(statistics.median(all_medians), 4),
                "band_max": max(all_medians),
                "calibration_sec": round(statistics.median(cals), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
