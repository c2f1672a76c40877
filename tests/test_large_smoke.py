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


def test_large_sequence_packing(big):
    """Greedy packing over 1e6 synthetic docs: invariants hold and the
    scan stays sharded (no single-task state)."""
    from cuplyr_spark.pipeline.packing import pack_greedy
    from cuplyr_spark import tbl as _tbl

    docs = _tbl(
        big.df.select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 900 + 100).cast("long").alias("n_tokens"),
        )
    )
    packed = pack_greedy(docs, budget=4096, shards=64)
    stats = (
        packed.df.groupBy("shard", "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
        .agg(
            F.count("*").alias("packs"),
            F.max(F.when(F.col("n") > 1, F.col("tot"))).alias("max_multi"),
        )
        .collect()[0]
    )
    assert stats.packs > 100_000  # ~1e6 docs / handful per pack
    assert stats.max_multi <= 4096  # only singletons may exceed budget


def test_large_rolling_and_funnel(spark):
    """Rolling window + funnel over 1e6 events across 10k users: one
    keyed shuffle each, bounded output."""
    from cuplyr_spark import tbl as _tbl
    from cuplyr_spark.operators.events import funnel, with_rolling_agg

    ev = _tbl(
        spark.range(1_000_000)
        .withColumn("user_id", F.col("id") % 10_000)
        .withColumn("ts", F.timestamp_millis(1704067200000 + F.col("id") * 797))
        .withColumn(
            "event_type",
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.col("id") % 3 + 1).cast("int"),
            ),
        )
        .withColumn("value", (F.col("id") % 13).cast("double"))
    )
    fu = funnel(ev, ["view", "click", "purchase"])
    assert fu.df.count() == 10_000
    roll = with_rolling_agg(ev, "value", "user_id", "ts", 3_600_000)
    assert roll.df.count() == 1_000_000
