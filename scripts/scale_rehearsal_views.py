"""Incremental-materialized-view scale rehearsal: a 25M-row base in 8
time-ordered segments with a grouped 5-agg view over ~100k groups,
then the maintenance lifecycle at a scale where the naive alternative
(re-running the GROUP BY per refresh) is what a dashboard pipeline
actually pays —

1. initial materialization (the one full GROUP BY — the floor)
2. small insert-only append (~0.4% of rows) → arithmetic-merge refresh
3. larger append (~4%) → arithmetic-merge refresh
4. a range DELETE dirtying a slice of groups → affected-group
   recompute refresh (manifest-pruned by the group key's zone maps)
5. the from-scratch GROUP BY over the final table (what every refresh
   WOULD cost without incremental maintenance), plus exactness: the
   view must equal it row-for-row

The 100 TB claim under test: refresh cost is ∝ the changed data —
insert windows read only the appended rows; delete windows read only
the affected groups' base rows (segment-pruned when the grouping key
is clustered) — never the corpus. Reports walls + the full/incremental
ratio per refresh.

Run: python scripts/scale_rehearsal_views.py  (VIEW_ROWS=n to resize)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.session import get_session
from cuplyr_spark.sources.connectors import (
    append_snapshot,
    delete_append_rows,
    read_append_snapshot,
)
from cuplyr_spark.sources.views import (
    create_append_view,
    read_append_view,
    refresh_append_view,
)

N = int(os.environ.get("VIEW_ROWS", 25_000_000))
SEGS = 8
GROUPS = 100_000

AGGS = {
    "revenue": ("sum", "amount"),
    "n": ("count", None),
    "max_amount": ("max", "amount"),
    "min_ts": ("min", "ts"),
    "avg_amount": ("mean", "amount"),
}


def batch(spark, lo, hi):
    # time-ordered ingest: group key correlates with position, so the
    # per-segment zone maps on `g` are tight — the clustered-dashboard
    # shape (device/day keys arriving roughly in order)
    return Frame(
        spark.range(lo, hi, 1, 32).select(
            (F.col("id") * F.lit(GROUPS) / F.lit(N))
            .cast("long").alias("g"),
            (F.pmod(F.col("id") * 2654435761, 100000) / 100.0)
            .cast("double").alias("amount"),
            F.col("id").cast("long").alias("ts"),
        ),
        (),
    )


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return out, dt


def main():
    spark = get_session()
    root = tempfile.mkdtemp(prefix="view_rehearsal_")
    base, view = root + "/base", root + "/view"
    report = {"rows": N, "groups": GROUPS}
    try:
        per = N // SEGS
        _, w = timed(
            f"ingest {N:,} rows / {SEGS} segments",
            lambda: [
                append_snapshot(batch(spark, i * per, (i + 1) * per), base)
                for i in range(SEGS)
            ],
        )
        _, w = timed(
            "initial materialization (full GROUP BY)",
            lambda: create_append_view(spark, base, view, "g", AGGS),
        )
        report["initial_s"] = round(w, 2)

        small = N // 256
        append_snapshot(batch(spark, N, N + small), base)
        _, w = timed(
            f"refresh after +{small:,} rows (insert-only merge)",
            lambda: refresh_append_view(spark, view),
        )
        report["small_insert_refresh_s"] = round(w, 2)

        big = N // 25
        append_snapshot(batch(spark, N + small, N + small + big), base)
        _, w = timed(
            f"refresh after +{big:,} rows (insert-only merge)",
            lambda: refresh_append_view(spark, view),
        )
        report["big_insert_refresh_s"] = round(w, 2)

        lo, hi = GROUPS // 2, GROUPS // 2 + GROUPS // 100
        _, _ = timed(
            f"DELETE dirtying groups [{lo}, {hi})",
            lambda: delete_append_rows(
                spark, base, {"g": [(">=", lo), ("<", hi)]}
            ),
        )
        _, w = timed(
            "refresh after delete (affected-group recompute)",
            lambda: refresh_append_view(spark, view),
        )
        report["delete_refresh_s"] = round(w, 2)

        def full():
            df = read_append_snapshot(spark, base).df.groupBy("g").agg(
                F.sum("amount").alias("revenue"),
                F.count(F.lit(1)).alias("n"),
                F.max("amount").alias("max_amount"),
                F.min("ts").alias("min_ts"),
                F.avg("amount").alias("avg_amount"),
            )
            return df.count()

        n_direct, w = timed("from-scratch GROUP BY (the avoided cost)", full)
        report["full_groupby_s"] = round(w, 2)
        report["speedup_small_insert"] = round(
            report["full_groupby_s"] / report["small_insert_refresh_s"], 1
        )
        report["speedup_delete"] = round(
            report["full_groupby_s"] / report["delete_refresh_s"], 1
        )

        # exactness: view == direct aggregate (sums compared to cents)
        v = read_append_view(spark, view).df
        direct = read_append_snapshot(spark, base).df.groupBy("g").agg(
            F.sum("amount").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
            F.max("amount").alias("max_amount"),
            F.min("ts").alias("min_ts"),
            F.avg("amount").alias("avg_amount"),
        )

        def canon(df):
            return df.select(
                "g",
                F.round("revenue", 2).alias("revenue"),
                "n", "max_amount", "min_ts",
                F.round("avg_amount", 6).alias("avg_amount"),
            )

        diff = (
            canon(v).exceptAll(canon(direct)).count()
            + canon(direct).exceptAll(canon(v)).count()
        )
        report["view_rows"] = v.count()
        report["direct_rows"] = n_direct
        report["exact"] = diff == 0
        print(json.dumps(report))
        assert diff == 0, f"view diverged from direct aggregate: {diff} rows"
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
