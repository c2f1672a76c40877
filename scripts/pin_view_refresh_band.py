"""Pin the view_refresh_incremental wall-time BAND on this VM
(VERDICT r14 residual #2 → r15 forward item #4): the query's code has
been stable since r13, yet driver artifacts read 1.90 s (r13) →
2.65 s (r14) while the builder's same-tree close-outs stayed flat
(2.13 → 2.08 s) — two rounds of "host contention" adjudications
without a recorded distribution.

Method: the same interleaved same-process protocol as
``pin_q6_band.py``, adapted to a SIDE-EFFECTING maintenance action
(every sample appends a 20k-row batch to the base table and runs the
incremental view refresh — there is no reusable plan, so per-sample
work includes one append commit + one MERGE refresh): K temporally
separated blocks of N calls, a calibration sample between blocks.
Reports per-block medians, the whole-run band, and the calibration
constant — future verdicts compare a driver reading against the band
(scaled by the calibration ratio) instead of re-adjudicating.

    python scripts/pin_view_refresh_band.py [sf_dir]
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

import bench  # noqa: E402
from bench import calibrate  # noqa: E402
from cuplyr_spark.session import get_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench.SF_DIR = sf_dir
    spark = get_session(app_name="view_refresh_band")
    action = bench.ACTIONS["view_refresh_incremental"](spark)
    for _ in range(3):
        action()  # warm-up: JIT + first-refresh state materialization
    blocks, cals = [], []
    for b in range(5):
        cals.append(calibrate()["sec"])
        samples = []
        for _ in range(7):
            t0 = time.perf_counter()
            action()
            samples.append(time.perf_counter() - t0)
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
                "query": "view_refresh_incremental",
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
