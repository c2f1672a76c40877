"""Zone-map scale rehearsal: 25M rows of time-ordered ingest across 16
append segments, then a narrow key-range read three ways —

1. plain read + .filter()            (parquet row-group pushdown only)
2. stats_filter manifest pruning     (segments never listed or opened)
3. stats_filter on the CHANGE FEED across a fold (per-adding-version
   stats recovery)

The 100 TB claim under test: with range-clustered ingest (monotone
event time / ids), manifest zone maps cut a selective read's IO from
"every segment's listing + footers + row-group stats" to "only the
overlapping segments" — a constant-factor win locally that becomes
the whole game when one table is thousands of segments on an object
store. Reports wall time, files touched, and rows (exactness check).
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
    compact_append_snapshot,
    read_append_changes,
    read_append_snapshot,
)

N = int(os.environ.get("ZM_ROWS", 25_000_000))
SEGS = int(os.environ.get("ZM_SEGS", 16))
# bloom sizing: ~11 bits per element per segment at k=7 -> ~1% FP.
# per-segment distinct "uid" count: ~1.45M of the 10M domain at
# 25M/16 rows per segment -> m = 2^24 bits = 2 MiB of words/segment
BLOOM_M = int(os.environ.get("ZM_BLOOM_M", 1 << 24))
BLOOM_K = 7


def main():
    spark = get_session()
    d = tempfile.mkdtemp(prefix="zm_rehearsal_") + "/t"
    per = N // SEGS
    print(f"staging {SEGS} appends x {per} rows (monotone key)...")
    t0 = time.time()
    for i in range(SEGS):
        df = (
            spark.range(i * per, (i + 1) * per)
            .select(
                F.col("id").alias("k"),
                # scattered high-cardinality key: every segment holds
                # uids from the whole domain (ranges can't prune it)
                (F.xxhash64(F.col("id")) % 10_000_000).alias("uid"),
                (F.rand(seed=i) * 1000).alias("v"),
                F.sha1(F.col("id").cast("string")).alias("payload"),
            )
        )
        append_snapshot(
            Frame(df, ()), d, batch_id=i,
            sketch_spec=(
                {"bloom": {"uid": [BLOOM_M, BLOOM_K]}} if i == 0 else None
            ),
        )
    t_stage = time.time() - t0
    print(f"staged in {t_stage:.1f}s (incl. stats + bloom sidecars)")

    lo, hi = 3 * per + 1000, 3 * per + 200_000  # inside segment 3 only
    pred = [(">=", lo), ("<", hi)]
    expect = hi - lo

    def run(tag, fn, want=None):
        t = time.time()
        df = fn()
        n = df.count()
        files = len(df.inputFiles())
        dt = time.time() - t
        if want is not None:
            assert n == want, f"{tag}: {n} != {want}"
        print(f"{tag:28s} {dt:6.2f}s  files={files}  rows={n}")
        return dt, files, n

    t_plain, f_plain, _ = run(
        "plain read + filter",
        lambda: read_append_snapshot(spark, d).df.filter(
            (F.col("k") >= lo) & (F.col("k") < hi)
        ),
        want=expect,
    )
    t_zm, f_zm, _ = run(
        "stats_filter (zone maps)",
        lambda: read_append_snapshot(spark, d, stats_filter={"k": pred}).df,
        want=expect,
    )

    # bloom point lookup on the scattered high-cardinality uid: ranges
    # span the whole domain in every segment, so only the sidecar
    # blooms can prune — measure against the plain filter
    probe = (
        spark.range(12345, 12346)
        .select((F.xxhash64(F.col("id")) % 10_000_000).alias("u"))
        .first()["u"]
    )
    t_uplain, f_uplain, n_u = run(
        "plain uid point lookup",
        lambda: read_append_snapshot(spark, d).df.filter(
            F.col("uid") == probe
        ),
    )
    t_ubloom, f_ubloom, n_ub = run(
        "bloom-pruned uid lookup",
        lambda: read_append_snapshot(
            spark, d, stats_filter={"uid": probe}
        ).df,
        want=n_u,
    )

    # fold the first half of the table, then a CDF window spanning the
    # fold must still prune from the ADDING version's recorded stats
    v_fold = compact_append_snapshot(
        spark, d, target_file_bytes=1 << 40, max_live_segments=SEGS // 2
    )
    print(f"folded to {v_fold} (max_live_segments={SEGS // 2})")
    t_cdf, f_cdf, _ = run(
        "CDF across fold + zone maps",
        lambda: read_append_changes(
            spark, d, since_version=0, version=SEGS,
            stats_filter={"k": pred},
        ).df,
        want=expect,
    )

    out = {
        "rows": N,
        "segments": SEGS,
        "stage_sec": round(t_stage, 2),
        "plain_sec": round(t_plain, 2),
        "zone_map_sec": round(t_zm, 2),
        "cdf_fold_sec": round(t_cdf, 2),
        "speedup": round(t_plain / t_zm, 2),
        "files_plain": f_plain,
        "files_zone_map": f_zm,
        "files_cdf": f_cdf,
        "uid_plain_sec": round(t_uplain, 2),
        "uid_bloom_sec": round(t_ubloom, 2),
        "uid_rows": n_u,
        "files_uid_plain": f_uplain,
        "files_uid_bloom": f_ubloom,
    }
    print(json.dumps(out))
    shutil.rmtree(os.path.dirname(d), ignore_errors=True)


if __name__ == "__main__":
    main()
