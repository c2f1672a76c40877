"""Dual-construction-path harness (the rebuild analog of the
reference's eager/lazy dual-mode tests, helper-gpu.R:344-351): the
same logical query built via the fluent Frame API and via SQL over
registered views must agree exactly."""

import os

import pytest

from cuplyr_spark import agg as A
from cuplyr_spark import desc, read_parquet
from tests.helpers import assert_frame_matches


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet")).to_view("v_lineitem")
    orders = read_parquet(spark, os.path.join(sf_dir, "orders.parquet")).to_view("v_orders")
    return li, orders


def test_dualmode_filter_agg(spark, views):
    li, _ = views
    fluent = (
        li.filter("l_quantity > 30")
        .group_by("l_returnflag")
        .summarise(n=A.n(), s=A.sum("l_quantity"))
        .collect()
    )
    sql = spark.sql(
        """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS s
           FROM v_lineitem WHERE l_quantity > 30 GROUP BY l_returnflag"""
    ).toPandas()
    assert_frame_matches(fluent, sql)


def test_dualmode_join_topk(spark, views):
    li, orders = views
    fluent = (
        li.inner_join(orders, by={"l_orderkey": "o_orderkey"}, na_matches="never")
        .group_by("o_orderstatus")
        .summarise(n=A.n())
        .arrange(desc("n"), "o_orderstatus")
        .collect()
    )
    sql = spark.sql(
        """SELECT o_orderstatus, count(*) AS n
           FROM v_lineitem JOIN v_orders ON l_orderkey = o_orderkey
           GROUP BY o_orderstatus ORDER BY n DESC, o_orderstatus"""
    ).toPandas()
    assert fluent["o_orderstatus"].tolist() == sql["o_orderstatus"].tolist()
    assert fluent["n"].tolist() == sql["n"].tolist()


def test_tidy_verbs(spark):
    import pandas as pd

    from cuplyr_spark import from_pandas

    t = from_pandas(spark, pd.DataFrame({"a": ["x", "y"], "b": ["1", "2"]}))
    u = t.unite("ab", "a", "b", sep="-")
    assert u.columns == ["ab"]
    assert sorted(u.pull("ab")) == ["x-1", "y-2"]
    s = u.separate("ab", ["a", "b"], sep="-")
    assert sorted(s.columns) == ["a", "b"]

    filled = from_pandas(
        spark,
        pd.DataFrame({"i": [1, 2, 3, 4], "v": [10.0, None, None, 20.0]}),
    ).fill_down(["v"], order_by="i")
    out = filled.collect().sort_values("i")
    assert out["v"].tolist() == [10.0, 10.0, 10.0, 20.0]
