"""Experiment: same 25M group&summarise, but the input resident as
parquet on tmpfs (/dev/shm) read through the native vectorized parquet
reader, vs the in-memory columnar cache. Both are 'data in memory';
the reader path differs.
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

N = 25_000_000
ITERS = 10
PATH = "/dev/shm/exp_taxi_25m.parquet"


def main():
    spark = get_session(app_name="exp_shm")
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
    df.write.mode("overwrite").parquet(PATH)
    t = Frame(spark.read.parquet(PATH))
    q = t.group_by("VendorID", "payment_type").summarise(
        avg_fare=A.mean("fare_amount"),
        avg_tip=A.mean("tip_amount"),
        avg_distance=A.mean("trip_distance"),
        n=A.n(),
    ).df
    q.write.format("noop").mode("overwrite").save()
    q.write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        samples.append((time.perf_counter() - t0) * 1000)
    print(json.dumps({
        "config": "shm_parquet",
        "median_ms": round(statistics.median(samples), 1),
        "min_ms": round(min(samples), 1),
        "samples": [round(s, 1) for s in samples],
    }))
    import shutil

    shutil.rmtree(PATH, ignore_errors=True)


if __name__ == "__main__":
    main()
