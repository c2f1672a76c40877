"""Scale rehearsal: mergeable fixed-bin histogram sketches vs the
exact percentile path, 25M rows — the histogram twin of
`scale_rehearsal_sketch.py` (HLL). Measures the sketch layer's claims
at rehearsal scale instead of arguing them:

- exact: `percentile(col, [p...])` per group — Spark's exact
  interpolated percentile aggregate buffers/sorts VALUES per group.
- sketch: `histogram_sketch` per (group, shard) + exact element-wise
  merge + `histogram_quantiles` — bins-length arrays on the wire,
  cost independent of row count past the first map pass.

PASS = every sketch estimate within one bin width of the exact
quantile (the deterministic bound), merge-of-shards identical to the
whole-data histogram at 25M rows, and the sketch path not slower.
Results recorded in BENCH_REFERENCE.md. Run:
python scripts/scale_rehearsal_histogram.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

ROWS = 25_000_000
GROUPS = 8
SHARDS = 16
BINS = 256
LO, HI = 0.0, 1000.0
PS = [0.5, 0.9, 0.99]


def main():
    from pyspark.sql import functions as F

    from cuplyr_spark.frame import Frame
    from cuplyr_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
        merge_histogram_sketches,
    )
    from cuplyr_spark.session import get_session

    spark = get_session(app_name="rehearsal_hist", cpus=32,
                        shuffle_partitions=32)
    # skewed-ish synthetic metric: squared uniform stretches the tail
    df = (
        spark.range(ROWS)
        .select(
            (F.col("id") % GROUPS).alias("g"),
            (F.col("id") % SHARDS).alias("shard"),
            (F.pow(F.rand(seed=42), F.lit(2.0)) * (HI - LO)).alias("x"),
        )
        .persist()
    )
    df.count()  # materialize so both paths read the same cached input
    fr = Frame(df, ())

    t0 = time.time()
    exact = {
        r["g"]: r["qs"]
        for r in df.groupBy("g")
        .agg(F.percentile("x", F.array(*[F.lit(p) for p in PS])).alias("qs"))
        .collect()
    }
    exact_s = time.time() - t0

    t0 = time.time()
    per = histogram_sketch(fr, "x", lo=LO, hi=HI, bins=BINS,
                           by=["g", "shard"])
    merged = merge_histogram_sketches(per, by="g")
    est = {
        r["g"]: r["q"]
        for r in histogram_quantiles(merged, PS, by="g").df.collect()
    }
    sketch_s = time.time() - t0

    width = (HI - LO) / BINS
    worst = max(
        abs(est[g][i] - exact[g][i]) for g in exact for i in range(len(PS))
    )
    # merge-exactness at scale: union of 16 shard sketches == one-shot
    whole = histogram_sketch(fr, "x", lo=LO, hi=HI, bins=BINS, by="g")
    wm = {r["g"]: r["hist"] for r in whole.df.collect()}
    mm = {r["g"]: r["hist"] for r in merged.df.collect()}
    merge_exact = wm == mm

    ok = worst <= width + 1e-9 and merge_exact and sketch_s <= exact_s * 1.2
    print(json.dumps({
        "rows": ROWS, "groups": GROUPS, "shards": SHARDS, "bins": BINS,
        "exact_percentile_s": round(exact_s, 2),
        "sketch_path_s": round(sketch_s, 2),
        "worst_abs_err": round(worst, 3),
        "bin_width_bound": round(width, 3),
        "merge_exact_at_25m": merge_exact,
        "pass": ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
