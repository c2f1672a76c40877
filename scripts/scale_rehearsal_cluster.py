"""Key-clustering scale rehearsal: the same 25M-row / 8-segment table
built twice — plain vs ``cluster_by=`` — and the key-addressed
lifecycle run on both:

1. point/range READ by key (file-grain vs segment-grain scan bytes)
2. keyed MERGE of a 100k-row corrections batch (the probe scan is the
   measured dominant cost of merge-on-read at scale, BENCH_DELTA r11)
3. scattered-key DELETE via an IN list
4. exactness: both tables agree with each other after every step

The 100 TB claim under test: with per-file zone maps, a key probe's
scan cost is ∝ the key range's file slice, not the candidate
segments' bytes — the same manifest arithmetic as segment pruning,
one grain finer. Clustering costs one range shuffle per batch at
WRITE time (∝ batch bytes); this prints both sides of that trade.
"""

from __future__ import annotations

import json
import os
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
    upsert_append_rows,
)

N = int(os.environ.get("CL_ROWS", 25_000_000))
SEGS = int(os.environ.get("CL_SEGS", 8))
FILES = int(os.environ.get("CL_FILES", 16))


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s")
    return out, dt


def batch(spark, i):
    per = N // SEGS
    # keys interleave across segments (mod-SEGS residue classes), so
    # every segment covers the whole key range — segment-grain zone
    # maps CANNOT prune a key probe; only file grain can. This is the
    # honest ingest shape (arrival order is not key order).
    return Frame(
        spark.range(i, N, SEGS).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("int").alias("cat"),
            (F.rand(seed=i) * 100).alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        ),
        (),
    )


def build(spark, d, clustered):
    for i in range(SEGS):
        b = batch(spark, i)
        if clustered:
            kw = {"cluster_files": FILES}
            if i == 0:
                kw["cluster_by"] = "k"
            append_snapshot(b, d, batch_id=i, **kw)
        else:
            # SAME file count as the clustered table (round-robin, no
            # key order) so the comparison isolates clustering itself,
            # not per-file overhead
            append_snapshot(Frame(b.df.repartition(FILES), ()), d, batch_id=i)


def main():
    spark = get_session()
    root = tempfile.mkdtemp(prefix="cluster_rehearsal_")
    plain, clust = root + "/plain", root + "/clust"
    rep: dict = {"rows": N, "segs": SEGS, "files_per_seg": FILES}

    _, rep["build_plain_s"] = timed("build plain", lambda: build(spark, plain, False))
    _, rep["build_clustered_s"] = timed(
        "build clustered", lambda: build(spark, clust, True)
    )

    # 1. range read by key: 0.1% slice
    lo, hi = N // 2, N // 2 + N // 1000
    filt = {"k": [(">=", lo), ("<", hi)]}

    def read_count(d):
        fr = read_append_snapshot(spark, d, stats_filter=filt)
        return fr.df.count(), len(fr.df.inputFiles())

    (n_p, files_p), rep["read_plain_s"] = timed(
        "range read plain", lambda: read_count(plain)
    )
    (n_c, files_c), rep["read_clustered_s"] = timed(
        "range read clustered", lambda: read_count(clust)
    )
    assert n_p == n_c == hi - lo, (n_p, n_c)
    rep["read_files_plain"] = files_p
    rep["read_files_clustered"] = files_c
    print(f"  files opened: plain={files_p} clustered={files_c}")

    # 2. keyed MERGE: 100k corrections in one contiguous key band
    # (the late-correction shape: recent keys get restated)
    def corrections(seed):
        return Frame(
            spark.range(N - 100_000, N).select(
                F.col("id").alias("k"),
                F.lit(-1).cast("int").alias("cat"),
                F.lit(float(seed)).alias("v"),
                F.lit("corrected").alias("payload"),
            ),
            (),
        )

    (_, rep["merge_plain_s"]) = timed(
        "merge 100k plain", lambda: upsert_append_rows(corrections(1), plain, "k")
    )
    (_, rep["merge_clustered_s"]) = timed(
        "merge 100k clustered", lambda: upsert_append_rows(corrections(1), clust, "k")
    )

    # 3. scattered-key DELETE: 2k ids spread over the whole range
    ids = list(range(0, N, N // 2000))

    (_, rep["delete_plain_s"]) = timed(
        "scattered delete plain",
        lambda: delete_append_rows(spark, plain, {"k": ("in", ids)}),
    )
    (_, rep["delete_clustered_s"]) = timed(
        "scattered delete clustered",
        lambda: delete_append_rows(spark, clust, {"k": ("in", ids)}),
    )

    # 4. exactness: both tables end in the same state
    def fingerprint(d):
        df = read_append_snapshot(spark, d).df
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k")).alias("sk"),
            F.sum(F.col("cat").cast("long")).alias("sc"),
        ).first()

    fp, fc = fingerprint(plain), fingerprint(clust)
    assert tuple(fp) == tuple(fc), (fp, fc)
    rep["final_rows"] = fp["n"]
    print("exactness: both tables identical —", dict(fp.asDict()))
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
