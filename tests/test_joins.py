"""Join tests vs DuckDB oracle (SURVEY §2.7).

Key semantics under test: eqNullSafe key matching (reference
``src/ops_join.cpp:161``), keep=False key-drop + coalesce,
``.x``/``.y`` suffixing, right-join column order, multi-key and
renamed-key specs. Order-insensitive comparison throughout (the
reference preserves left-row order; Spark doesn't — documented
divergence SURVEY §7).
"""

import os

import pandas as pd
import pytest

from cuplyr_spark import from_pandas, read_parquet
from tests.helpers import assert_frame_matches, oracle


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return read_parquet(spark, os.path.join(sf_dir, "customer.parquet"))


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return read_parquet(spark, os.path.join(sf_dir, "nation.parquet"))


def test_inner_join_renamed_key(orders, customer, duck):
    got = (
        orders.inner_join(customer, by={"o_custkey": "c_custkey"})
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
        .collect()
    )
    want = oracle(
        duck,
        """SELECT o_orderkey, o_custkey, c_name, o_totalprice
           FROM orders JOIN customer ON o_custkey = c_custkey""",
    )
    assert_frame_matches(got, want)


def test_left_join_unmatched_nulls(customer, nation, duck):
    got = (
        customer.left_join(nation, by={"c_nationkey": "n_nationkey"})
        .select("c_custkey", "n_name")
        .collect()
    )
    want = oracle(
        duck,
        """SELECT c_custkey, n_name FROM customer
           LEFT JOIN nation ON c_nationkey = n_nationkey""",
    )
    assert_frame_matches(got, want)


def test_right_and_full_join(spark, duck):
    l = from_pandas(spark, pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]}))
    r = from_pandas(spark, pd.DataFrame({"k": [2, 3, 4], "b": [200, 300, 400]}))
    right = l.right_join(r, by="k").collect()
    assert sorted(right["k"].tolist()) == [2, 3, 4]
    assert right.columns.tolist() == ["k", "a", "b"]  # x cols then y cols
    full = l.full_join(r, by="k").collect()
    assert sorted(full["k"].tolist()) == [1, 2, 3, 4]  # keys coalesced


def test_null_keys_match(spark):
    """na_matches='na' is the reference's only mode — NULL==NULL."""
    l = from_pandas(spark, pd.DataFrame({"k": [1.0, None], "a": [1, 2]}))
    r = from_pandas(spark, pd.DataFrame({"k": [None, 1.0], "b": [10, 20]}))
    na = l.inner_join(r, by="k").collect()
    assert len(na) == 2  # NULL matched NULL
    never = l.inner_join(r, by="k", na_matches="never").collect()
    assert len(never) == 1


def test_suffix_on_conflicts(spark):
    l = from_pandas(spark, pd.DataFrame({"k": [1], "v": [1], "w": [1]}))
    r = from_pandas(spark, pd.DataFrame({"k": [1], "v": [2]}))
    out = l.inner_join(r, by="k")
    assert out.columns == ["k", "v.x", "w", "v.y"]
    custom = l.inner_join(r, by="k", suffix=("_l", "_r"))
    assert custom.columns == ["k", "v_l", "w", "v_r"]


def test_keep_true_keeps_both_keys(spark):
    l = from_pandas(spark, pd.DataFrame({"k": [1], "a": [1]}))
    r = from_pandas(spark, pd.DataFrame({"k": [1], "b": [2]}))
    out = l.inner_join(r, by="k", keep=True)
    assert out.columns == ["k.x", "a", "k.y", "b"]


def test_natural_join(spark):
    l = from_pandas(spark, pd.DataFrame({"k": [1, 2], "j": [1, 1], "a": [1, 2]}))
    r = from_pandas(spark, pd.DataFrame({"k": [1, 2], "j": [1, 2], "b": [5, 6]}))
    out = l.inner_join(r).collect()  # by=["k","j"]
    assert len(out) == 1
    assert out["a"].tolist() == [1]


def test_multikey_join_oracle(spark, duck, sf_dir):
    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    got = (
        li.inner_join(li, by=["l_orderkey", "l_linenumber"], suffix=("_a", "_b"))
        .select("l_orderkey", "l_linenumber", "l_quantity_a", "l_quantity_b")
        .collect()
    )
    want = oracle(
        duck,
        """SELECT a.l_orderkey, a.l_linenumber,
                  a.l_quantity AS l_quantity_a, b.l_quantity AS l_quantity_b
           FROM lineitem a JOIN lineitem b
           USING (l_orderkey, l_linenumber)""",
    )
    assert_frame_matches(got, want)


def test_semi_anti_join(orders, customer, duck):
    got = (
        customer.semi_join(orders, by={"c_custkey": "o_custkey"})
        .select("c_custkey")
        .collect()
    )
    want = oracle(
        duck,
        """SELECT c_custkey FROM customer
           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    )
    assert_frame_matches(got, want)

    got_a = (
        customer.anti_join(orders, by={"c_custkey": "o_custkey"})
        .select("c_custkey")
        .collect()
    )
    want_a = oracle(
        duck,
        """SELECT c_custkey FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    )
    assert_frame_matches(got_a, want_a)


def test_cross_join(spark, duck, sf_dir):
    region = read_parquet(spark, os.path.join(sf_dir, "region.parquet"))
    nation = read_parquet(spark, os.path.join(sf_dir, "nation.parquet"))
    got = region.cross_join(nation).collect()
    assert len(got) == 5 * 25


def test_self_join_unambiguous(nation):
    """The prefix-rename strategy must make self-joins work."""
    out = nation.inner_join(nation, by={"n_regionkey": "n_regionkey"}, keep=False)
    assert len(out.collect()) > 0


def test_broadcast_join_plan(orders, customer):
    """broadcast() must produce a BroadcastHashJoin physical plan."""
    j = orders.inner_join(customer.broadcast(), by={"o_custkey": "c_custkey"})
    assert "BroadcastHashJoin" in j.explain_str("simple")


def test_key_type_mismatch_joins_numerics(spark):
    """Reference validate_key_types: both-numeric passes (int vs double)."""
    l = from_pandas(spark, pd.DataFrame({"k": [1, 2]}))
    r = from_pandas(spark, pd.DataFrame({"k": [1.0, 3.0], "b": [1.0, 2.0]}))
    out = l.inner_join(r, by="k").collect()
    assert len(out) == 1


def test_broadcast_size_guard(customer):
    """Guard-rail parity with the reference's pre-join OOM estimate
    (R/join.R:102-166), hardened: an explicit broadcast hint whose
    Catalyst size estimate exceeds the threshold is DROPPED (no-op +
    warning) so an oversized hint can never ship as an executor OOM;
    force=True overrides; under the threshold, and with the check
    disabled, the hint applies silently."""
    import warnings

    import pytest

    def _has_hint(frame):
        s = frame.df._jdf.queryExecution().analyzed().toString()
        return "ResolvedHint" in s or "hint" in s.lower()

    with pytest.warns(UserWarning, match="broadcast.*hint dropped"):
        dropped = customer.broadcast(max_bytes=1)
    assert not _has_hint(dropped)  # degraded to no-op, AQE decides

    forced = customer.broadcast(max_bytes=1, force=True)
    assert _has_hint(forced)  # explicit override keeps the hint

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # tiny table, default threshold — silent, hint applied
        assert _has_hint(customer.broadcast())
        # check disabled — silent, hint applied
        assert _has_hint(customer.broadcast(max_bytes=0))
