"""Bucketed-table tests: the join of two tables bucketed on the join
key must plan WITHOUT any Exchange — the pre-shuffled-at-write-time
guarantee that makes repeat joins cheap at scale."""

import os

import pandas as pd
import pytest

from cuplyr_spark import from_pandas
from cuplyr_spark.sources.bucketed import drop_table, read_table, write_bucketed
from cuplyr_spark.sources.connectors import read_lakehouse


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    a = from_pandas(
        spark, pd.DataFrame({"k": list(range(100)), "a": list(range(100))})
    )
    b = from_pandas(
        spark, pd.DataFrame({"k": list(range(0, 200, 2)), "b": list(range(100))})
    )
    write_bucketed(a, "bk_a", 4, "k", sort_cols=("k",))
    write_bucketed(b, "bk_b", 4, "k", sort_cols=("k",))
    yield "bk_a", "bk_b"
    drop_table(spark, "bk_a")
    drop_table(spark, "bk_b")


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    a, b = read_table(spark, ta), read_table(spark, tb)
    # force the shuffle-join path (tiny test tables would otherwise
    # auto-broadcast, which hides the property under test)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.inner_join(b, by="k", na_matches="never")
        plan = j.explain_str("formatted")
        assert "Exchange" not in plan  # both sides pre-bucketed: no shuffle
        assert "SortMergeJoin" in plan
        out = j.collect()
        assert len(out) == 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_no_exchange(spark, bucketed_pair):
    from cuplyr_spark import agg as A

    ta, _ = bucketed_pair
    q = read_table(spark, ta).group_by("k").summarise(s=A.sum("a"))
    assert "Exchange" not in q.explain_str("formatted")


def test_lakehouse_stub_raises_clearly(spark):
    with pytest.raises(ModuleNotFoundError, match="delta support requires"):
        read_lakehouse(spark, "delta", "/tmp/nope")
    with pytest.raises(ValueError):
        read_lakehouse(spark, "csvx", "/tmp/nope")
