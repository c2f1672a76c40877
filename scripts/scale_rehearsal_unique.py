"""UNIQUE-constraint scale rehearsal: what does the write-time
uniqueness probe cost per append at 25M rows?

Two key layouts, both at 8 batches x ~3.1M rows:

- ``sequential`` (time-ordered ingest, the common shape): each batch
  is a fresh contiguous key band. The probe's key RANGE (the
  >100k-key fallback of ``join_prune_filter``) misses every existing
  segment's zone maps, so the constraint's marginal cost is ~the
  range aggregate — near zero.
- ``interleaved`` (worst case): every batch spans the whole key
  space, so nothing can prune the probe and it scans the live
  corpus' key column. This prices the constraint honestly where no
  layout helps.

Then an insert-ignore batch of 1M duplicate keys confined to the
FIRST band (+100k genuinely new appended separately): >100k keys
degrades to the range filter, which prunes the probe to the one
overlapping band — segment grain on sequential tables, file grain on
clustered ones. Exactness asserted: no duplicate lands, originals
kept.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.session import get_session
from cuplyr_spark.sources.connectors import (
    append_snapshot,
    read_append_snapshot,
)

N = int(os.environ.get("UQ_ROWS", 25_000_000))
SEGS = int(os.environ.get("UQ_SEGS", 8))
FILES = int(os.environ.get("UQ_FILES", 16))
PER = N // SEGS


def batch(spark, i, layout):
    ids = (
        spark.range(i * PER, (i + 1) * PER)
        if layout == "sequential"
        else spark.range(i, N, SEGS)
    )
    return Frame(
        ids.select(
            F.col("id").alias("k"),
            (F.rand(seed=i) * 100).alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        ),
        (),
    )


def build(spark, d, layout, unique):
    walls = []
    for i in range(SEGS):
        kw = {"cluster_files": FILES, "cluster_by": "k"} if i == 0 else {
            "cluster_files": FILES
        }
        if i == 0 and unique:
            kw["unique_key"] = "k"
        t0 = time.time()
        append_snapshot(batch(spark, i, layout), d, batch_id=i, **kw)
        walls.append(time.time() - t0)
    return walls


def main():
    warnings.filterwarnings("ignore")
    spark = get_session()
    root = tempfile.mkdtemp(prefix="uq_rehearsal_")
    rep: dict = {"rows": N, "segs": SEGS, "files_per_seg": FILES}

    rep["last_append_s"] = {}
    for layout in ("sequential", "interleaved"):
        wu = build(spark, f"{root}/{layout}_u", layout, unique=True)
        wp = build(spark, f"{root}/{layout}_p", layout, unique=False)
        rep["last_append_s"][layout] = {
            "unique": round(wu[-1], 2),
            "no_constraint": round(wp[-1], 2),
        }
        print(layout, "last-append walls:", rep["last_append_s"][layout])

    # insert-ignore: 1M dups confined to the first key band (range
    # fallback prunes the probe to that band), then 100k new keys
    d = f"{root}/sequential_u"
    dups = Frame(
        spark.range(0, 1_000_000).select(
            F.col("id").alias("k"),
            F.lit(-1.0).alias("v"),
            F.lit("dup").alias("payload"),
        ),
        (),
    )
    t0 = time.time()
    v = append_snapshot(dups, d, batch_id=8, on_conflict="drop")
    rep["insert_ignore_1m_dups_s"] = round(time.time() - t0, 2)
    assert read_append_snapshot(spark, d).df.count() == N
    news = Frame(
        spark.range(N, N + 100_000).select(
            F.col("id").alias("k"),
            F.lit(-2.0).alias("v"),
            F.lit("new").alias("payload"),
        ),
        (),
    )
    t0 = time.time()
    append_snapshot(news, d, batch_id=9, on_conflict="drop")
    rep["insert_ignore_100k_new_s"] = round(time.time() - t0, 2)
    n = read_append_snapshot(spark, d).df.count()
    assert n == N + 100_000, n
    kept = (
        read_append_snapshot(spark, d, stats_filter={"k": ("<", 1_000_000)})
        .df.filter("v = -1.0")
        .count()
    )
    assert kept == 0, kept  # originals kept: ignore, not upsert
    rep["final_rows"] = n
    print("insert-ignore:", rep["insert_ignore_1m_dups_s"], "s (1M dups),",
          rep["insert_ignore_100k_new_s"], "s (100k new); exact")
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
