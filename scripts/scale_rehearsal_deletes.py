"""Deletion-vector scale rehearsal: 25M rows across 8 append segments,
then the merge-on-read lifecycle at a scale where a copy-on-write
DELETE would rewrite gigabytes —

1. a range DELETE through zone maps (candidate segments only scanned)
2. a scattered-id DELETE (~1% of rows across EVERY segment)
3. full-table read BEFORE vs AFTER deletes (the DV anti-join overhead
   readers actually pay)
4. purge-compaction (deletes materialized, DVs dropped)
5. read after the purge (back to the clean-scan path)

The 100 TB claim under test: a DELETE's cost is candidate-segment scan
+ DV bytes ∝ deleted rows (never a table rewrite); the read-side tax
is a broadcast-hash anti-join over only the delete-carrying segments,
which compaction amortizes away. Reports walls + exactness checks.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.session import get_session
from cuplyr_spark.sources.connectors import (
    append_snapshot,
    compact_append_snapshot,
    delete_append_rows,
    read_append_snapshot,
    vacuum_append_snapshot,
)

N = int(os.environ.get("DV_ROWS", 25_000_000))
SEGS = int(os.environ.get("DV_SEGS", 8))
# DV_PARTITIONED=1 reruns the flow on a hive-partitioned table: its DV
# addresses use the within-segment relative path (regex-derived — the
# partition dirs reuse basenames), so this measures the slow
# addressing path honestly
PARTITIONED = os.environ.get("DV_PARTITIONED") == "1"


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s")
    return out, dt


def main():
    spark = get_session()
    d = tempfile.mkdtemp(prefix="dv_rehearsal_") + "/t"
    per = N // SEGS
    print(f"staging {N:,} rows in {SEGS} segments at {d}")
    for i in range(SEGS):
        batch = spark.range(i * per, (i + 1) * per).select(
            F.col("id").cast("long"),
            (F.col("id") % 9_999_991).alias("uid"),
            (F.col("id") % 97).cast("double").alias("v"),
            (F.col("id") % 8).cast("string").alias("p"),
        )
        append_snapshot(
            Frame(batch, ()), d, batch_id=i,
            partition_by="p" if PARTITIONED else None,
        )

    read0, t_read0 = timed(
        "full read before deletes",
        lambda: read_append_snapshot(spark, d).df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
        ).collect()[0],
    )
    assert read0["n"] == N

    # 1. range delete: zone maps scope the scan to ONE segment
    lo, hi = 3 * per, 3 * per + per // 10  # 10% of one segment
    (_, n_range), t_del_range = timed(
        f"range delete [{lo:,}, {hi:,})",
        lambda: delete_append_rows(spark, d, {"id": [(">=", lo), ("<", hi)]}),
    )
    assert n_range == per // 10, n_range

    # 2. scattered delete: ~1% of all rows, touching every segment
    (_, n_scat), t_del_scat = timed(
        "scattered 1% delete (every segment)",
        lambda: delete_append_rows(spark, d, "id % 100 = 7"),
    )
    expected_scat = sum(
        1 for _ in range(0, 1)
    )  # computed exactly below from the read
    live_expected = N - n_range - n_scat

    read1, t_read1 = timed(
        "full read AFTER deletes (DV anti-join tax)",
        lambda: read_append_snapshot(spark, d).df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
        ).collect()[0],
    )
    assert read1["n"] == live_expected, (read1["n"], live_expected)

    _, t_purge = timed(
        "purge-compaction (materialize deletes)",
        lambda: compact_append_snapshot(
            spark, d, target_file_bytes=256 << 20, purge_deletes=True,
            shuffle=True,  # large fold: parallel write beats zero-shuffle
        ),
    )
    read2, t_read2 = timed(
        "full read after purge (clean path)",
        lambda: read_append_snapshot(spark, d).df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
        ).collect()[0],
    )
    assert read2["n"] == live_expected and read2["s"] == read1["s"]
    vacuum_append_snapshot(d, keep_last=1, orphan_grace_hours=0)

    out = {
        "rows": N,
        "segments": SEGS,
        "partitioned": PARTITIONED,
        "deleted_range": n_range,
        "deleted_scattered": n_scat,
        "read_before_s": round(t_read0, 2),
        "delete_range_s": round(t_del_range, 2),
        "delete_scattered_s": round(t_del_scat, 2),
        "read_with_dv_s": round(t_read1, 2),
        "dv_read_tax": round(t_read1 / t_read0, 2),
        "purge_compact_s": round(t_purge, 2),
        "read_after_purge_s": round(t_read2, 2),
    }
    print(json.dumps(out))
    shutil.rmtree(os.path.dirname(d), ignore_errors=True)


if __name__ == "__main__":
    main()
