"""applyInPandasWithState operators: streaming dedup + running totals."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuplyr_spark import from_pandas
from cuplyr_spark.streaming.stateful import streaming_dedup, streaming_running_total
from cuplyr_spark.streaming.stream import run_to_memory, stream_parquet

SCHEMA = "event_id long, k string, value double"


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stateful_src"))
    rows = [
        (0, "a", 1.0),
        (1, "a", 2.0),
        (2, "b", 5.0),
        (3, "b", 6.0),
        (4, "c", 9.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "k", "value"])
    from_pandas(spark, pdf).df.coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_streaming_dedup(spark, src_dir):
    src = stream_parquet(spark, src_dir, SCHEMA)
    out = streaming_dedup(src, "k", "event_id")
    run_to_memory(out, "dedup_out", output_mode="append")
    got = spark.sql("SELECT * FROM dedup_out").toPandas().sort_values("key")
    assert got["key"].tolist() == ["a", "b", "c"]
    assert len(got) == 3  # one emission per key, duplicates dropped


def test_streaming_running_total(spark, src_dir):
    src = stream_parquet(spark, src_dir, SCHEMA)
    out = streaming_running_total(src, "k", "value")
    run_to_memory(out, "total_out", output_mode="update")
    got = spark.sql("SELECT * FROM total_out").toPandas().sort_values("key")
    assert got.set_index("key")["total"].to_dict() == {"a": 3.0, "b": 11.0, "c": 9.0}
    assert got.set_index("key")["n"].to_dict() == {"a": 2, "b": 2, "c": 1}
