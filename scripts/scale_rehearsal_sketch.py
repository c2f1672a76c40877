"""Distinct-sketch rehearsal (round 8, sketch layer).

The claim under test: for distinct counting over a high-cardinality
key, the HLL sketch aggregate shuffles FIXED-SIZE sketch bytes per
(group × partition) while the exact distinct aggregate shuffles one
row per distinct (group, key) — so at corpus scale the sketch path's
shuffle is orders of magnitude smaller and its wall time flat in key
cardinality, at a bounded (~1%) accuracy cost. Also re-asserts, at
rehearsal scale, that the union of per-shard sketches equals the
whole-data sketch (the lossless-merge property the incremental
pattern relies on).

Setup: N_ROWS rows (default 25M), ~N_ROWS/3 distinct keys, 8 groups,
32 shuffle partitions on local[32] (phase-per-process rule: this is
the only Spark job in the process).

Measured per path: wall time and total shuffle-write bytes (from the
Spark REST API). PASS criteria:

1. sketch estimate within 3% of exact for every group (lgk=14, ~4σ);
2. shard-merged estimates == whole-data estimates (lossless merge);
3. sketch shuffle bytes < 5% of exact-distinct shuffle bytes;
4. sketch wall <= exact wall (it should be well under).

Usage: python scripts/scale_rehearsal_sketch.py [n_rows]
Output: one JSON line + a markdown table row for BENCH_REFERENCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.operators.sketch import (
    approx_distinct,
    distinct_sketch,
    merge_distinct_sketches,
)
from cuplyr_spark.session import get_session

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000


def shuffle_write_bytes(spark) -> int:
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    try:
        with urllib.request.urlopen(f"{base}/stages", timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return -1
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    spark = get_session(
        app_name="sketch_rehearsal",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    df = spark.range(N_ROWS).select(
        (F.col("id") % 8).alias("g"),
        (F.xxhash64("id") % (N_ROWS // 3)).alias("k"),
    )
    frame = Frame(df, ())

    # exact distinct (the verification path)
    sw0 = shuffle_write_bytes(spark)
    t0 = time.time()
    exact = {
        r["g"]: r["n_distinct"]
        for r in approx_distinct(frame, "k", by="g", exact=True)
        .df.collect()
    }
    exact_wall = time.time() - t0
    exact_shuffle = shuffle_write_bytes(spark) - sw0

    # sketch path (whole data)
    sw1 = shuffle_write_bytes(spark)
    t1 = time.time()
    whole = {
        r["g"]: r["n_distinct_est"]
        for r in merge_distinct_sketches(
            distinct_sketch(frame, "k", by="g", lgk=14), "sketch", by="g"
        ).df.collect()
    }
    sketch_wall = time.time() - t1
    sketch_shuffle = shuffle_write_bytes(spark) - sw1

    # shard merge losslessness at scale
    sharded = Frame(df.withColumn("shard", F.pmod(F.col("k"), 16)), ())
    merged = {
        r["g"]: r["n_distinct_est"]
        for r in merge_distinct_sketches(
            distinct_sketch(sharded, "k", by=["g", "shard"], lgk=14),
            "sketch",
            by="g",
        ).df.collect()
    }

    max_rel = max(abs(whole[g] - exact[g]) / exact[g] for g in exact)
    lossless = merged == whole
    shuffle_ratio = (
        sketch_shuffle / exact_shuffle if exact_shuffle > 0 else float("nan")
    )
    ok = (
        max_rel <= 0.03
        and lossless
        and (exact_shuffle <= 0 or shuffle_ratio < 0.05)
        and sketch_wall <= exact_wall * 1.05
    )
    print(
        json.dumps(
            {
                "rehearsal": "sketch_distinct",
                "n_rows": N_ROWS,
                "n_groups": 8,
                "approx_distinct_keys": N_ROWS // 3,
                "exact_wall_s": round(exact_wall, 2),
                "sketch_wall_s": round(sketch_wall, 2),
                "exact_shuffle_bytes": exact_shuffle,
                "sketch_shuffle_bytes": sketch_shuffle,
                "shuffle_ratio": round(shuffle_ratio, 5),
                "max_rel_err": round(max_rel, 5),
                "shard_merge_lossless": lossless,
                "pass": ok,
            }
        )
    )
    print(
        f"| sketch vs exact distinct | {N_ROWS / 1e6:.0f}M rows, "
        f"{N_ROWS // 3 / 1e6:.1f}M keys | exact {exact_wall:.1f}s / "
        f"{exact_shuffle / 1e6:.0f} MB shuffle | sketch {sketch_wall:.1f}s / "
        f"{sketch_shuffle / 1e6:.1f} MB shuffle | max err "
        f"{max_rel * 100:.2f}% | lossless merge: {lossless} |"
    )
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
