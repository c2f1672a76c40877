"""Rename-era read rehearsal: a metadata-only column rename must not
change the READ cost shape — the era-aware scan reads one multi-path
relation per NAME ERA (∝ renames, a handful), never one per segment.

Builds the same 8M-row / 8-segment unpartitioned table twice:
- control: no rename (single era, the classic one-relation scan)
- renamed: the value column renamed after segment 4 (two eras)

and times (a) a full aggregate over the value column and (b) a
zone-map-prunable range read through it, on each. PASS = the two-era
wall time is within noise of single-era (the union adds one relation,
not per-segment overhead), and both reads return identical results.

Run: python scripts/scale_rehearsal_rename.py [rows_per_seg]
Recorded in BENCH_REFERENCE.md ("Rename-era read rehearsal").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from cuplyr_spark.frame import Frame  # noqa: E402
from cuplyr_spark.session import get_session  # noqa: E402
from cuplyr_spark.sources.connectors import (  # noqa: E402
    append_snapshot,
    read_append_snapshot,
    rename_append_column,
)

ROWS_PER_SEG = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_SEGS = 8


def build(spark, d, rename_after: int | None):
    for b in range(N_SEGS):
        name = "v" if rename_after is None or b <= rename_after else "val"
        lo = b * ROWS_PER_SEG
        df = spark.range(lo, lo + ROWS_PER_SEG).select(
            F.col("id"), (F.col("id") % 1000).cast("double").alias(name)
        )
        append_snapshot(Frame(df, ()), d, batch_id=b)
        if rename_after is not None and b == rename_after:
            rename_append_column(d, "v", "val", spark)


def timed(fn, n=3):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    spark = get_session(app_name="rename_rehearsal", cpus=16,
                        shuffle_partitions=16)
    root = tempfile.mkdtemp(prefix="rename_rehearsal_")
    ctrl, ren = f"{root}/ctrl", f"{root}/ren"
    try:
        t0 = time.perf_counter()
        build(spark, ctrl, None)
        # control table keeps the head name for identical reads
        rename_append_column(ctrl, "v", "val", spark)
        build_ctrl = time.perf_counter() - t0
        # control's rename happened AFTER every segment — all 8 in one
        # (old-name) era; the two-era table splits 5 + 3
        t0 = time.perf_counter()
        build(spark, ren, rename_after=4)
        build_ren = time.perf_counter() - t0

        def agg(d):
            return (
                read_append_snapshot(spark, d).df
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("val").alias("s"))
                .collect()[0]
            )

        def pruned(d):
            return (
                read_append_snapshot(
                    spark, d, where=f"id >= {6 * ROWS_PER_SEG}"
                ).df.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
            )

        wa_c, ra_c = timed(lambda: agg(ctrl))
        wa_r, ra_r = timed(lambda: agg(ren))
        assert (ra_c["n"], ra_c["s"]) == (ra_r["n"], ra_r["s"]), (
            ra_c, ra_r
        )
        wp_c, rp_c = timed(lambda: pruned(ctrl))
        wp_r, rp_r = timed(lambda: pruned(ren))
        assert rp_c == rp_r == 2 * ROWS_PER_SEG, (rp_c, rp_r)
        print(json.dumps({
            "rows": N_SEGS * ROWS_PER_SEG, "segments": N_SEGS,
            "eras_renamed_table": 2,
            "build_s": [round(build_ctrl, 1), round(build_ren, 1)],
            "full_agg_s": {"one_era": round(wa_c, 3),
                           "two_era": round(wa_r, 3)},
            "pruned_read_s": {"one_era": round(wp_c, 3),
                              "two_era": round(wp_r, 3)},
            "results_identical": True,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
