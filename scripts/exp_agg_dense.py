"""Experiment (round 3, VERDICT #2): pruned cache + dense small-domain
aggregation for the 25M-row group&summarise reference benchmark.

Round-2 analysis (`BENCH_REFERENCE.md:37-64`) showed the residual gap
vs DuckDB is the per-row hash-map probe: DuckDB perfect-hashes the
tiny (4x5) key domain into a dense array and aggregates SIMD-style;
Spark's codegen hash agg probes an UnsafeRow map per row. Two things
to measure:

1. ``pruned``: the cache already holds ONLY the 5 touched columns
   (keys + 3 agg inputs) -- confirms the projected-cache floor the
   VERDICT asked for.
2. ``dense``: eliminate the hash map entirely by rewriting the
   grouped agg as ONE ungrouped aggregate row of conditional
   expressions (`sum(when(pk=k, x))` per key combo), then inlining
   the 20 combos back to rows. This is exactly Spark's own pivot
   strategy (conditional aggregation), and the per-partition partial
   agg is a single codegen'd accumulator row -- no probe, no
   UnsafeRow map, shuffle carries one row per partition.
3. ``offheap``: columnVector.offheap for the cache scan.

Each config runs in a fresh process: pass the config name as argv[1].
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from cuplyr_spark import Frame, agg as A
from cuplyr_spark.session import get_session

CONFIGS = {
    "pruned": {},
    "offheap": {
        "spark.sql.columnVector.offheap.enabled": "true",
    },
    "dense": {},
    "dense_nullaware": {},
}

N = 25_000_000
ITERS = 10


def q_hash(t: Frame):
    """Current engine path (packed int-key hash aggregate)."""
    return t.group_by("VendorID", "payment_type").summarise(
        avg_fare=A.mean("fare_amount"),
        avg_tip=A.mean("tip_amount"),
        avg_distance=A.mean("trip_distance"),
        n=A.n(),
    ).df


def q_dense(t: Frame, null_aware: bool):
    """Dense small-domain aggregation: one ungrouped aggregate of
    conditional sums/counts per key combo (VendorID in 1..4,
    payment_type in 1..5 -> pk in 0..19), then inline back to rows.

    null_aware adds a per-column non-null count (what a generic
    engine path must do for mean); the fixture has no nulls so both
    shapes return identical results.
    """
    pk = (F.col("VendorID") - 1) * 5 + (F.col("payment_type") - 1)
    df = t.df.withColumn("__pk", pk)
    aggs = []
    for k in range(20):
        m = F.col("__pk") == k
        aggs.append(F.sum(F.when(m, F.col("fare_amount"))).alias(f"sf{k}"))
        aggs.append(F.sum(F.when(m, F.col("tip_amount"))).alias(f"st{k}"))
        aggs.append(F.sum(F.when(m, F.col("trip_distance"))).alias(f"sd{k}"))
        aggs.append(F.count(F.when(m, F.lit(1))).alias(f"n{k}"))
        if null_aware:
            aggs.append(F.count(F.when(m, F.col("fare_amount"))).alias(f"cf{k}"))
            aggs.append(F.count(F.when(m, F.col("tip_amount"))).alias(f"ct{k}"))
            aggs.append(F.count(F.when(m, F.col("trip_distance"))).alias(f"cd{k}"))
    one = df.agg(*aggs)
    structs = []
    for k in range(20):
        nf = f"cf{k}" if null_aware else f"n{k}"
        nt = f"ct{k}" if null_aware else f"n{k}"
        nd = f"cd{k}" if null_aware else f"n{k}"
        structs.append(
            F.struct(
                F.lit(k // 5 + 1).alias("VendorID"),
                F.lit(k % 5 + 1).alias("payment_type"),
                (F.col(f"sf{k}") / F.col(nf)).alias("avg_fare"),
                (F.col(f"st{k}") / F.col(nt)).alias("avg_tip"),
                (F.col(f"sd{k}") / F.col(nd)).alias("avg_distance"),
                F.col(f"n{k}").alias("n"),
            )
        )
    return one.select(F.inline(F.array(*structs)))


def main():
    name = sys.argv[1]
    spark = get_session(app_name=f"exp_{name}", extra_conf=CONFIGS[name])
    df = (
        spark.range(N)
        .select(
            (F.floor(F.rand(42) * 4) + 1).cast("int").alias("VendorID"),
            (F.floor(F.rand(43) * 5) + 1).cast("int").alias("payment_type"),
            F.greatest(F.lit(2.5), F.randn(44) * 10 + 13).alias("fare_amount"),
            F.greatest(F.lit(0.0), F.randn(45) * 3 + 2.5).alias("tip_amount"),
            F.greatest(F.lit(0.1), -F.log(F.rand(48)) / 0.3).alias("trip_distance"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    t = Frame(df).compute()
    t.df.write.format("noop").mode("overwrite").save()
    if name.startswith("dense"):
        q = q_dense(t, null_aware=name == "dense_nullaware")
    else:
        q = q_hash(t)
    q.write.format("noop").mode("overwrite").save()
    q.write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        samples.append((time.perf_counter() - t0) * 1000)
    print(json.dumps({
        "config": name,
        "median_ms": round(statistics.median(samples), 1),
        "min_ms": round(min(samples), 1),
        "samples": [round(s, 1) for s in samples],
    }))


if __name__ == "__main__":
    main()
