"""Row/column verb tests vs DuckDB oracle (SURVEY §2.2-2.5).

Differential structure mirrors the reference's dplyr-as-oracle pattern
(``tests/testthat/test-workflow.R``): same logical query on Spark and
DuckDB, compared order-insensitively.
"""

import os

import pandas as pd
import pytest

from cuplyr_spark import (
    read_parquet,
    from_pandas,
    desc,
    starts_with,
    ends_with,
    contains,
    matches,
    everything,
    any_of,
)
from tests.helpers import assert_frame_matches, oracle


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))


# -- select ------------------------------------------------------------


def test_select_basic(lineitem, duck):
    got = lineitem.select("l_orderkey", "l_quantity").collect()
    want = oracle(duck, "SELECT l_orderkey, l_quantity FROM lineitem")
    assert_frame_matches(got, want)


def test_select_reorders(lineitem):
    assert lineitem.select("l_quantity", "l_orderkey").columns == [
        "l_quantity",
        "l_orderkey",
    ]


def test_select_helpers(lineitem):
    assert lineitem.select(starts_with("l_r")).columns == ["l_returnflag"]
    assert lineitem.select(ends_with("key")).columns == [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
    ]
    assert lineitem.select(contains("line")).columns == ["l_linenumber", "l_linestatus"]
    assert lineitem.select(matches("l_(tax|discount)")).columns == [
        "l_discount",
        "l_tax",
    ]
    assert lineitem.select(everything()).columns == lineitem.columns
    assert lineitem.select(any_of(["l_tax", "nope"])).columns == ["l_tax"]


def test_select_negative(lineitem):
    got = lineitem.select("-l_orderkey")
    assert "l_orderkey" not in got.columns
    assert len(got.columns) == len(lineitem.columns) - 1


def test_select_drops_deselected_groups(lineitem):
    g = lineitem.group_by("l_returnflag", "l_linestatus")
    assert g.select("l_returnflag", "l_quantity").group_vars() == ("l_returnflag",)


def test_rename(lineitem):
    out = lineitem.rename(qty="l_quantity")
    assert "qty" in out.columns and "l_quantity" not in out.columns
    # grouping metadata follows the rename
    g = lineitem.group_by("l_quantity").rename(qty="l_quantity")
    assert g.group_vars() == ("qty",)


# -- filter ------------------------------------------------------------


def test_filter_scalar_ops(lineitem, duck):
    for op in ["<", "<=", ">", ">=", "==", "!="]:
        duck_op = "=" if op == "==" else op
        got = lineitem.filter(f"l_quantity {op} 25").select("l_orderkey", "l_linenumber").collect()
        want = oracle(
            duck,
            f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity {duck_op} 25",
        )
        assert_frame_matches(got, want)


def test_filter_col_op_col(lineitem, duck):
    got = lineitem.filter("l_discount > l_tax").select("l_orderkey", "l_linenumber").collect()
    want = oracle(
        duck,
        "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_discount > l_tax",
    )
    assert_frame_matches(got, want)


def test_filter_multiple_anded(lineitem, duck):
    got = (
        lineitem.filter("l_quantity > 10", "l_discount < 0.05", "l_returnflag == 'N'")
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    want = oracle(
        duck,
        """SELECT l_orderkey, l_linenumber FROM lineitem
           WHERE l_quantity > 10 AND l_discount < 0.05 AND l_returnflag = 'N'""",
    )
    assert_frame_matches(got, want)


def test_filter_literal_bool(lineitem):
    assert len(lineitem.filter(False).collect()) == 0
    assert len(lineitem.filter(True).collect()) == len(lineitem.collect())


def test_filter_null_drops_row(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [1.0, None, 3.0]}))
    assert t.filter("x > 0").collect()["x"].tolist() == [1.0, 3.0]


# -- mutate ------------------------------------------------------------


def test_mutate_arithmetic(lineitem, duck):
    got = (
        lineitem.mutate(
            revenue="l_extendedprice * (1 - l_discount)",
            qty2="l_quantity + 1",
            half="l_quantity / 2",
            sq="l_quantity ^ 2",
            m5="l_quantity % 5",
            d5="floor(l_quantity / 5)",
        )
        .select("l_orderkey", "l_linenumber", "revenue", "qty2", "half", "sq", "m5", "d5")
        .collect()
    )
    want = oracle(
        duck,
        """SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue,
               l_quantity + 1 AS qty2,
               l_quantity / 2 AS half,
               l_quantity ^ 2 AS sq,
               l_quantity % 5 AS m5,
               floor(l_quantity / 5) AS d5
           FROM lineitem""",
    )
    assert_frame_matches(got, want)


def test_mutate_chained_refs(spark):
    """Later exprs see earlier outputs (reference test-mutate.R:250)."""
    t = from_pandas(spark, pd.DataFrame({"a": [1, 2, 3]}))
    out = t.mutate(b="a * 2", c="b + a").collect()
    assert out["c"].tolist() == [3, 6, 9]


def test_mutate_replace_preserves_position(lineitem):
    out = lineitem.mutate(l_quantity="l_quantity * 2")
    assert out.columns == lineitem.columns


def test_mutate_copy_column(spark):
    t = from_pandas(spark, pd.DataFrame({"a": [1, 2]}))
    out = t.mutate(b="a")
    assert out.collect()["b"].tolist() == [1, 2]


def test_mutate_type_promotion(spark):
    """int op int -> int (non-division); division -> double; mixed -> double."""
    t = from_pandas(spark, pd.DataFrame({"i": [1, 2], "d": [1.5, 2.5]}))
    out = t.mutate(ii="i + i", dd="i + d", dv="i / i")
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["ii"] == "bigint"
    assert types["dd"] == "double"
    assert types["dv"] == "double"


def test_transmute(lineitem):
    out = lineitem.transmute(rev="l_extendedprice * (1 - l_discount)")
    assert out.columns == ["rev"]


# -- arrange -----------------------------------------------------------


def test_arrange_multikey_desc(lineitem, duck):
    got = (
        lineitem.arrange(desc("l_quantity"), "l_orderkey", "l_linenumber")
        .head(50)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .collect()
    )
    want = oracle(
        duck,
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
           ORDER BY l_quantity DESC, l_orderkey, l_linenumber LIMIT 50""",
    )
    # order-sensitive comparison: same rows AND same order
    assert got["l_quantity"].tolist() == want["l_quantity"].tolist()
    assert got["l_orderkey"].tolist() == want["l_orderkey"].tolist()


def test_arrange_na_placement(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [2.0, None, 1.0, None, 3.0]}))
    asc = t.arrange("x").collect()["x"].tolist()
    assert asc[:3] == [1.0, 2.0, 3.0] and all(pd.isna(v) for v in asc[3:])
    dsc = t.arrange(desc("x")).collect()["x"].tolist()
    assert all(pd.isna(v) for v in dsc[:2]) and dsc[2:] == [3.0, 2.0, 1.0]


def test_arrange_by_group(spark):
    t = from_pandas(
        spark, pd.DataFrame({"g": ["b", "a", "b", "a"], "x": [2, 9, 1, 3]})
    ).group_by("g")
    out = t.arrange("x", by_group=True).collect()
    assert out["g"].tolist() == ["a", "a", "b", "b"]
    assert out["x"].tolist() == [3, 9, 1, 2]


# -- head / slice ---------------------------------------------------------


def test_head(lineitem):
    assert len(lineitem.head(7).collect()) == 7


def test_slice_max_global(lineitem, duck):
    got = lineitem.slice_max("l_extendedprice", n=5).select("l_orderkey", "l_linenumber", "l_extendedprice").collect()
    want = oracle(
        duck,
        """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
           ORDER BY l_extendedprice DESC LIMIT 5""",
    )
    assert sorted(got["l_extendedprice"]) == sorted(want["l_extendedprice"])


def test_slice_min_grouped(spark):
    t = from_pandas(
        spark, pd.DataFrame({"g": ["a", "a", "b", "b"], "x": [5, 1, 7, 3]})
    ).group_by("g")
    out = t.slice_min("x").collect().sort_values("g")
    assert out["x"].tolist() == [1, 3]


# -- distinct --------------------------------------------------------------


def test_distinct(lineitem, duck):
    got = lineitem.distinct("l_returnflag", "l_linestatus").collect()
    want = oracle(duck, "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
    assert_frame_matches(got, want)


def test_arrange_stable(spark):
    """stable=True emulates the reference's stable sort
    (cudf stable_sorted_order) via a row-index tiebreaker."""
    import pandas as pd

    from cuplyr_spark import from_pandas

    pdf = pd.DataFrame({"k": [1, 1, 1, 1], "tag": ["a", "b", "c", "d"]})
    out = from_pandas(spark, pdf).coalesce(1).arrange("k", stable=True).collect()
    assert out["tag"].tolist() == ["a", "b", "c", "d"]


def test_select_where_type_predicate(lineitem):
    """tidyselect where(): select by column TYPE (reference gets it
    free via tidyselect::eval_select, R/select.R:55-115). Pure
    driver-side schema inspection."""
    from cuplyr_spark import (
        is_character,
        is_double,
        is_integer,
        is_numeric,
        is_temporal,
        where,
    )

    types = {f.name: f.dataType.typeName() for f in lineitem.df.schema.fields}
    num = [
        c
        for c in lineitem.columns
        if types[c] in ("byte", "short", "integer", "long", "float", "double", "decimal")
    ]
    assert lineitem.select(where(is_numeric)).columns == num
    assert lineitem.select(where(is_character)).columns == [
        c for c in lineitem.columns if types[c] == "string"
    ]
    assert lineitem.select(where(is_temporal)).columns == [
        c for c in lineitem.columns if types[c] in ("date", "timestamp", "timestamp_ntz")
    ]
    # composes with names / other selectors, selection-order semantics
    got = lineitem.select("l_returnflag", where(is_integer)).columns
    assert got[0] == "l_returnflag" and set(got[1:]) == {
        c for c in lineitem.columns if types[c] in ("byte", "short", "integer", "long")
    }
    # arbitrary callable over the DataType works too
    assert lineitem.select(
        where(lambda dt: dt.typeName() == "double")
    ).columns == [c for c in lineitem.columns if types[c] == "double"]
    assert set(lineitem.select(where(is_double)).columns) >= set(
        lineitem.select(where(lambda dt: dt.typeName() == "double")).columns
    )


def test_where_requires_schema_context():
    """A TypeSelector resolved without a schema must raise, not
    silently select nothing."""
    import pytest as _pytest

    from cuplyr_spark import is_numeric, where
    from cuplyr_spark.selectors import resolve_selection

    with _pytest.raises(TypeError, match="schema"):
        resolve_selection([where(is_numeric)], ["a", "b"])
