"""Milestone 1 (SURVEY §7 step 1): load lineitem parquet, filter ->
select -> collect, hash-match DuckDB."""

import os

from cuplyr_spark import read_parquet
from tests.helpers import assert_frame_matches, oracle


def test_filter_select_collect_matches_duckdb(spark, duck, sf_dir):
    t = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    got = (
        t.filter("l_quantity > 45")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .collect()
    )
    want = oracle(
        duck,
        """
        SELECT l_orderkey, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity > 45
        """,
    )
    assert len(got) > 0
    assert_frame_matches(got, want)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """The filter and projection must reach the parquet scan
    (PushedFilters / narrow ReadSchema) — Catalyst doing SURVEY §4
    pass 1 & 4 for free."""
    t = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    q = t.filter("l_quantity > 45").select("l_orderkey", "l_quantity")
    plan = q.explain_str("formatted")
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,45" in plan
    # Column pruning: scan schema should not include unrelated columns.
    assert "l_comment" not in plan
    assert "l_extendedprice" not in plan
