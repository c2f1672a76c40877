"""Structured Streaming tests: drive a bounded file-source stream to
completion and check windowed/session aggregations against the batch
equivalents."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuplyr_spark import from_pandas
from cuplyr_spark.streaming.stream import (
    run_to_memory,
    session_agg,
    stream_parquet,
    windowed_agg,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Write a small deterministic event set as the streaming source."""
    d = str(tmp_path_factory.mktemp("stream_src"))
    rows = [
        (0, "2024-01-01 10:00:30", 1, "click", 1.0),
        (1, "2024-01-01 10:02:00", 1, "click", 2.0),
        (2, "2024-01-01 10:07:00", 1, "view", 3.0),
        (3, "2024-01-01 10:00:10", 2, "click", 5.0),
        (4, "2024-01-01 11:00:00", 2, "click", 7.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    from_pandas(spark, pdf).df.coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_windowed_agg_stream(spark, stream_dir):
    src = stream_parquet(spark, stream_dir, SCHEMA)
    assert src.isStreaming
    agg = windowed_agg(
        src,
        "ts",
        window="5 minutes",
        watermark="10 minutes",
        group_cols=("event_type",),
        n=F.count(F.lit(1)),
        total=F.sum("value"),
    )
    run_to_memory(agg, "win_out", output_mode="complete")
    out = spark.sql("SELECT * FROM win_out").toPandas()
    clicks_1000 = out[
        (out.event_type == "click")
        & (out.window_start == pd.Timestamp("2024-01-01 10:00:00"))
    ]
    assert clicks_1000["n"].tolist() == [3]
    assert clicks_1000["total"].tolist() == [8.0]


def test_session_agg_stream_matches_batch(spark, stream_dir):
    src = stream_parquet(spark, stream_dir, SCHEMA)
    agg = session_agg(
        src,
        "ts",
        "user_id",
        gap="30 minutes",
        watermark="2 hours",
        n=F.count(F.lit(1)),
    )
    run_to_memory(agg, "sess_out", output_mode="complete")
    out = spark.sql("SELECT * FROM sess_out").toPandas()
    # user 1: one session of 3; user 2: two sessions (1h apart)
    u1 = out[out.user_id == 1]
    assert u1["n"].tolist() == [3]
    u2 = out[out.user_id == 2].sort_values("session_start")
    assert u2["n"].tolist() == [1, 1]


def test_write_stream_parquet_available_now(spark, stream_dir, tmp_path):
    from cuplyr_spark.streaming.stream import write_stream_parquet

    src = stream_parquet(spark, stream_dir, SCHEMA)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = write_stream_parquet(src.filter(F.col("value") > 2), out_dir, ckpt)
    q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()
    assert sorted(got["value"].tolist()) == [3.0, 5.0, 7.0]


def test_stream_static_join(spark, stream_dir):
    from cuplyr_spark.streaming.stream import stream_static_join

    dim = from_pandas(
        spark,
        pd.DataFrame(
            [("click", 2.0), ("view", 10.0)], columns=["event_type", "weight"]
        ),
    )
    src = stream_parquet(spark, stream_dir, SCHEMA)
    enriched = stream_static_join(src, dim, on="event_type").withColumn(
        "weighted", F.col("value") * F.col("weight")
    )
    assert enriched.isStreaming
    run_to_memory(enriched, "enriched_events")
    out = spark.sql("SELECT * FROM enriched_events").toPandas()
    assert len(out) == 5  # left join keeps every stream row
    got = out.set_index("event_id").weighted
    assert got[0] == 2.0 and got[2] == 30.0 and got[4] == 14.0
