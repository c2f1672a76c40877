"""Plan-shape assertions (the rebuild analog of the reference's
optimizer tests, SURVEY §5.3: assert on plan structure, not results).
These pin the scale-critical properties: pushdown reaches the scan,
projections are pruned, small joins broadcast, aggregation is
partial+final, top-k avoids a global sort."""

import os

import pytest

from cuplyr_spark import agg as A
from cuplyr_spark import desc, read_parquet


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))


def test_filter_pushdown_through_mutate(lineitem):
    """Filter on a base column moves below the projection into the
    scan (Catalyst PushDownPredicates — reference optimizer pass 4)."""
    q = lineitem.mutate(rev="l_extendedprice * (1 - l_discount)").filter(
        "l_quantity > 30"
    )
    plan = q.explain_str("formatted")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30" in plan


def test_projection_pruning_reaches_scan(lineitem):
    """Only referenced columns appear in ReadSchema (pass 1/3)."""
    q = (
        lineitem.mutate(rev="l_extendedprice * (1 - l_discount)")
        .group_by("l_returnflag")
        .summarise(t=A.sum("rev"))
    )
    plan = q.explain_str("formatted")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read_schema and "l_returnflag" in read_schema
    assert "l_shipdate" not in read_schema and "l_partkey" not in read_schema


def test_mutate_chain_fuses_into_one_codegen_stage(lineitem):
    """Sequential mutates execute as ONE whole-stage-codegen loop (the
    reference needed a dedicated batch kernel + toposort for this,
    src/ops_mutate_batch.cpp). Catalyst may keep separate Project
    nodes when an output is referenced downstream, but they all fuse
    into a single codegen stage."""
    q = lineitem.mutate(a="l_quantity + 1").mutate(b="a * 2").mutate(c="b - a")
    plan = q.explain_str("formatted")
    codegen_ids = {
        line.split("codegen id : ")[1].rstrip("]")
        for line in plan.splitlines()
        if "codegen id" in line
    }
    assert codegen_ids == {"1"}
    # independent expressions DO collapse into one Project node
    import re

    q2 = lineitem.mutate(a="l_quantity + 1").mutate(b="l_tax * 2")
    plan2 = q2.explain_str("formatted")
    assert len(re.findall(r"^\(\d+\) Project", plan2, re.M)) == 1


def test_filters_combine(lineitem):
    """Consecutive filters AND into one predicate (CombineFilters —
    reference passes 5/6)."""
    q = lineitem.filter("l_quantity > 10").filter("l_discount < 0.05").filter(
        "l_tax > 0.01"
    )
    plan = q.explain_str("formatted")
    assert plan.count("Filter (") == 1


def test_broadcast_join(orders, lineitem):
    q = lineitem.inner_join(
        orders.broadcast(), by={"l_orderkey": "o_orderkey"}, na_matches="never"
    )
    assert "BroadcastHashJoin" in q.explain_str("simple")


def test_semi_join_plan(orders, lineitem):
    q = lineitem.semi_join(orders, by={"l_orderkey": "o_orderkey"}, na_matches="never")
    plan = q.explain_str("simple")
    assert "LeftSemi" in plan


def test_partial_aggregation(lineitem):
    """Hash aggregate runs map-side partials before the shuffle (the
    scale upgrade over the reference's single-pass groupby)."""
    q = lineitem.group_by("l_returnflag").summarise(s=A.sum("l_quantity"))
    plan = q.explain_str("formatted")
    assert "partial_sum" in plan


def test_topk_uses_take_ordered(lineitem):
    """arrange + head compiles to TakeOrderedAndProject, not a global
    sort of the whole table."""
    q = lineitem.arrange(desc("l_extendedprice")).head(10)
    assert "TakeOrderedAndProject" in q.explain_str("simple")


def test_union_is_shuffle_free(lineitem):
    q = lineitem.select("l_orderkey").bind_rows(lineitem.select("l_orderkey"))
    plan = q.explain_str("formatted")
    assert "Exchange" not in plan


def test_whole_stage_codegen_covers_scan_filter_project(lineitem):
    q = lineitem.filter("l_quantity > 30").mutate(r="l_extendedprice * 2")
    plan = q.explain_str("formatted")
    assert "codegen id" in plan  # filter+project inside a codegen span
