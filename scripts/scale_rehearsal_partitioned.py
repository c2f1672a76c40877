"""Scale rehearsal: hive-partitioned append tables — measure that a
partition-filtered read costs ∝ selected partition bytes, not table
bytes (the entire point of the layout for a 100 TB event table).

Builds an append table of SEGMENTS x ROWS_PER synthetic events over
N_TYPES event types (partition column), then times:

  full      read_append_snapshot(...).count()           — every byte
  pruned    read_append_snapshot(partition_filter=...)  — 1/N_TYPES
  residual  full read + .filter() on a NON-partition col — every byte
            (the shape a user falls into without the layout)

PASS when the pruned read touches only the selected partitions' files
(inputFiles check) and its wall time is well under the full scan's.

Results recorded in BENCH_REFERENCE.md ("Partitioned append table
rehearsal"). Run: python scripts/scale_rehearsal_partitioned.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SEGMENTS = 4
ROWS_PER = 8_000_000  # 32M rows / ~2 GB on disk: scan-dominated, so
N_TYPES = 16          # the wall-clock ratio reflects bytes touched


def main():
    from pyspark.sql import functions as F

    from cuplyr_spark.frame import Frame
    from cuplyr_spark.session import get_session
    from cuplyr_spark.sources.connectors import (
        append_snapshot,
        read_append_snapshot,
    )

    spark = get_session(app_name="rehearsal_part", cpus=16,
                        shuffle_partitions=32)
    table = tempfile.mkdtemp(prefix="rehearsal_part_") + "/t"
    for b in range(SEGMENTS):
        batch = (
            spark.range(b * ROWS_PER, (b + 1) * ROWS_PER)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % 97).alias("user_id"),
                F.concat(
                    F.lit("type_"), (F.col("id") % N_TYPES).cast("string")
                ).alias("event_type"),
                (F.rand(seed=b) * 100).alias("value"),
                # payload so scan cost is byte-dominated, as real
                # event tables are — not job-setup-dominated
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
        )
        append_snapshot(
            Frame(batch, ()), table, batch_id=b, partition_by="event_type"
        )

    def timed(df):
        # sum over a data column + length of the payload: forces a
        # real read of every surviving row's bytes (count() alone is
        # answered nearly for free from parquet metadata)
        t0 = time.time()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.length("payload")).alias("p"),
        ).collect()[0]
        return row["n"], time.time() - t0

    # warm the JVM/file-listing paths once
    timed(read_append_snapshot(spark, table).df)

    full_n, full_s = timed(read_append_snapshot(spark, table).df)
    pruned = read_append_snapshot(
        spark, table, partition_filter={"event_type": "type_3"}
    ).df
    pruned_n, pruned_s = timed(pruned)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    dir_pruned = "PartitionFilters: [" in plan and "type_3" in plan
    residual_n, residual_s = timed(
        read_append_snapshot(spark, table).df.filter("user_id = 3")
    )

    total = SEGMENTS * ROWS_PER
    ok = (
        full_n == total
        and pruned_n == total // N_TYPES
        and dir_pruned
        and pruned_s < full_s / 3
    )
    print(json.dumps({
        "rows": total, "segments": SEGMENTS, "types": N_TYPES,
        "full_s": round(full_s, 2),
        "pruned_s": round(pruned_s, 2),
        "speedup": round(full_s / pruned_s, 1),
        "pruned_rows": pruned_n,
        "scan_has_partition_filter": dir_pruned,
        "residual_filter_s": round(residual_s, 2),
        "pass": ok,
    }))
    shutil.rmtree(os.path.dirname(table), ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
