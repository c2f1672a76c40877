"""Migration-scale rehearsal: migrate_rename_append_column on a
clustered multi-million-row table — wall cost and post-migration
pruning, measured.

The migration is priced openly as ONE whole-table rewrite (read live
rows, re-cluster under the new name, one atomic commit). This script
verifies at rehearsal scale that (a) the wall tracks the table's
bytes (a compaction-shaped cost, not an O(n^2) surprise), (b) the
re-clustered layout file-prunes under the NEW name immediately, and
(c) the rows come back bit-identical.

    python scripts/scale_rehearsal_migration.py [rows] [files]
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
    explain_append_scan,
    migrate_rename_append_column,
    read_append_snapshot,
)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_session(app_name="migration_rehearsal")
    d = tempfile.mkdtemp(prefix="migration_rehearsal_") + "/t"
    try:
        src = spark.range(rows).select(
            F.col("id").alias("user_id"),
            (F.col("id") % 97).alias("v"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        n_batches = 4
        per = rows // n_batches
        t0 = time.perf_counter()
        for b in range(n_batches):
            append_snapshot(
                Frame(src.filter(
                    (F.col("user_id") >= b * per)
                    & (F.col("user_id") < (b + 1) * per)
                ), ()),
                d, batch_id=b, cluster_by="user_id",
                cluster_files=files // n_batches,
            )
        ingest_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        checksum_before = read_append_snapshot(spark, d).df.agg(
            F.sum(F.crc32(F.concat_ws("|", "user_id", "v", "payload")))
        ).first()[0]
        read_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        migrate_rename_append_column(
            spark, d, "user_id", "uid", cluster_files=files
        )
        migrate_s = time.perf_counter() - t0

        checksum_after = read_append_snapshot(spark, d).df.agg(
            F.sum(F.crc32(F.concat_ws("|", "uid", "v", "payload")))
        ).first()[0]
        rep = explain_append_scan(
            spark, d, stats_filter={"uid": ("==", rows // 2)}
        ).df.collect()
        scan = [r for r in rep if r["action"] == "scan"]
        files_total = sum(r["files_total"] or 0 for r in rep)
        files_scan = sum(r["files_scan"] or 0 for r in scan)
        t0 = time.perf_counter()
        probe = read_append_snapshot(
            spark, d, stats_filter={"uid": ("==", rows // 2)}
        ).df.count()
        probe_s = time.perf_counter() - t0
        print(json.dumps({
            "rows": rows,
            "ingest_s": round(ingest_s, 2),
            "full_read_s": round(read_s, 2),
            "migrate_s": round(migrate_s, 2),
            "bit_identical": checksum_before == checksum_after,
            "post_files_total": files_total,
            "post_files_scan_point_probe": files_scan,
            "point_probe_rows": probe,
            "point_probe_s": round(probe_s, 2),
        }), flush=True)
        assert checksum_before == checksum_after
        assert files_scan < files_total
        assert probe == 1
    finally:
        shutil.rmtree(os.path.dirname(d), ignore_errors=True)


if __name__ == "__main__":
    main()
