"""Instrument the view_refresh_incremental bench action: break one
append+refresh iteration into its Spark jobs/phases and time each, so
optimization targets the real cost (guide section 1: measure first).

Usage: python scripts/profile_view_refresh.py [n_iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CUPLYR_BENCH_CACHED", "1")

import bench
from cuplyr_spark.session import get_session


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_session(app_name="cuplyr_profile_view_refresh")

    import shutil

    from pyspark.sql import functions as F

    from cuplyr_spark.frame import Frame
    from cuplyr_spark.sources.connectors import append_snapshot
    from cuplyr_spark.sources.views import (
        create_append_view,
        refresh_append_view,
    )

    base_dir = "/tmp/cuplyr_prof_view_base"
    view_dir = "/tmp/cuplyr_prof_view_def"
    shutil.rmtree(base_dir, ignore_errors=True)
    shutil.rmtree(view_dir, ignore_errors=True)
    orders = spark.read.parquet(os.path.join(bench.SF_DIR, "orders.parquet"))
    src = orders.select(
        (F.col("o_orderkey") % 64).alias("bucket"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    append_snapshot(Frame(src, ()), base_dir, batch_id=0)
    create_append_view(
        spark, base_dir, view_dir, "bucket",
        {"sum_cents": ("sum", "cents"), "n": ("count", None)},
    )
    refresh_append_view(spark, view_dir)
    batch = Frame(src.limit(20_000), ())

    # warmup
    append_snapshot(batch, base_dir, batch_id=1)
    refresh_append_view(spark, view_dir)

    appends, refreshes = [], []
    for i in range(2, 2 + n):
        t0 = time.perf_counter()
        append_snapshot(batch, base_dir, batch_id=i)
        t1 = time.perf_counter()
        refresh_append_view(spark, view_dir)
        t2 = time.perf_counter()
        appends.append(t1 - t0)
        refreshes.append(t2 - t1)
        print(f"iter {i}: append={t1-t0:.3f}s refresh={t2-t1:.3f}s")
    import statistics

    print(
        f"median append={statistics.median(appends):.3f}s "
        f"refresh={statistics.median(refreshes):.3f}s "
        f"total={statistics.median(appends)+statistics.median(refreshes):.3f}s"
    )


if __name__ == "__main__":
    main()
