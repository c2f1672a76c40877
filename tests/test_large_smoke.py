"""Large-data smoke + precision round-trips (reference §5.4 edge
matrix: 1e6-row operations, int64 precision, NA preservation through
transforms)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuplyr_spark import agg as A
from cuplyr_spark import desc, from_pandas, tbl


@pytest.fixture(scope="module")
def big(spark):
    # 1e6 rows generated JVM-side (range) — no driver transfer
    df = (
        spark.range(1_000_000)
        .withColumn("g", (F.col("id") % 1000).cast("int"))
        .withColumn("x", (F.col("id") % 97).cast("double"))
    )
    return tbl(df)


def test_large_filter_mutate_agg(big):
    out = (
        big.filter("x > 50")
        .mutate(y="x * 2 + 1")
        .group_by("g")
        .summarise(s=A.sum("y"), n=A.n())
        .collect()
    )
    assert len(out) == 1000
    assert out["n"].sum() == sum(1 for i in range(97) if i > 50) * (1_000_000 // 97) + sum(
        1 for i in range(1_000_000 % 97) if i > 50
    )


def test_large_sort_topk(big):
    out = big.arrange(desc("id")).head(5).collect()
    assert out["id"].tolist() == [999999, 999998, 999997, 999996, 999995]


def test_large_join(big):
    dims = tbl(
        big.df.sparkSession.range(1000).withColumn(
            "g", F.col("id").cast("int")
        ).withColumn("label", F.concat(F.lit("g"), F.col("id")))
    ).select("g", "label")
    out = big.inner_join(dims.broadcast(), by="g", na_matches="never")
    assert out.df.count() == 1_000_000


def test_int64_precision_roundtrip(spark):
    """Values beyond 2^53 survive ingest+collect exactly (the
    reference warns and degrades via FLOAT64, R/utils.R:12-17 —
    LongType is the documented upgrade)."""
    vals = [2**62, 2**62 + 1, -(2**61), 0]
    t = from_pandas(spark, pd.DataFrame({"v": pd.array(vals, dtype="int64")}))
    assert sorted(t.collect()["v"].tolist()) == sorted(vals)
    assert t.schema["v"].dataType.simpleString() == "bigint"


def test_na_preserved_through_mutate(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [1.0, None, 3.0]}))
    out = t.mutate(y="x * 2").arrange("x").collect()
    assert out["y"].tolist()[:2] == [2.0, 6.0]
    assert pd.isna(out["y"].tolist()[2])


def test_arrange_unary_minus_desc(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [2.0, None, 1.0]}))
    out = t.arrange("-x").collect()["x"].tolist()
    assert pd.isna(out[0]) and out[1:] == [2.0, 1.0]  # desc: NA first
