"""Experiment: in-memory-cache + shuffle knobs for the 25M-row
group&summarise reference benchmark (VERDICT r1 #4: 356.9ms vs DuckDB
67ms — the one headline outside 2x).

Each config runs in a fresh process (cache-format confs are read at
cache-build time): pass the config index as argv[1].
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
    "base": {},
    "uncompressed": {
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
    },
    "bigbatch": {
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
        "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
    },
    "bigbatch_comp": {
        "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
    },
    "shuffle8": {
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
        "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
        "spark.sql.shuffle.partitions": "8",
    },
    "noaqe": {
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
        "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
        "spark.sql.adaptive.enabled": "false",
    },
}

N = 25_000_000
ITERS = 10


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
        "config": name,
        "median_ms": round(statistics.median(samples), 1),
        "min_ms": round(min(samples), 1),
        "samples": [round(s, 1) for s in samples],
    }))


if __name__ == "__main__":
    main()
