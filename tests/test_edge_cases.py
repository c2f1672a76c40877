"""Edge-case matrix per operator (reference pattern, SURVEY §5.4):
empty tables, all-NA columns, zero-match filters, division by zero,
Inf/NaN, empty strings, lifecycle ops."""

import math

import pandas as pd
import pyspark.sql.types as T
import pytest

from cuplyr_spark import agg as A
from cuplyr_spark import desc, from_pandas


@pytest.fixture(scope="module")
def empty(spark):
    schema = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("g", T.StringType())]
    )
    return from_pandas(spark, pd.DataFrame({"x": [], "g": []}), schema=schema)


def test_empty_table_verbs(empty):
    assert len(empty.filter("x > 0").collect()) == 0
    assert len(empty.mutate(y="x * 2").collect()) == 0
    assert len(empty.arrange("x").collect()) == 0
    assert len(empty.group_by("g").summarise(n=A.n()).collect()) == 0
    assert empty.mutate(y="x * 2").columns == ["x", "g", "y"]


def test_ungrouped_summarise_on_empty_is_one_row(empty):
    out = empty.summarise(n=A.n(), s=A.sum("x")).collect()
    assert len(out) == 1
    assert out["n"].tolist() == [0]
    assert pd.isna(out["s"][0])


def test_zero_match_filter(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [1.0, 2.0]}))
    out = t.filter("x > 100")
    assert len(out.collect()) == 0
    assert out.columns == ["x"]


def test_all_na_column(spark):
    schema = T.StructType([T.StructField("x", T.DoubleType())])
    t = from_pandas(spark, pd.DataFrame({"x": [None, None, None]}), schema=schema)
    out = t.summarise(s=A.sum("x"), m=A.mean("x"), n=A.n()).collect()
    assert pd.isna(out["s"][0]) and pd.isna(out["m"][0])
    assert out["n"].tolist() == [3]


def test_division_by_zero(spark):
    """x/0 -> NULL: the session pins ansi.enabled=false so arithmetic
    never raises, matching the DuckDB oracle (R/cuDF produce Inf —
    documented divergence in favor of the correctness gate)."""
    t = from_pandas(spark, pd.DataFrame({"x": [1.0], "z": [0.0]}))
    val = t.mutate(q="x / z").collect()["q"][0]
    assert pd.isna(val)


def test_inf_nan_roundtrip(spark):
    t = from_pandas(
        spark, pd.DataFrame({"x": [float("inf"), float("-inf"), float("nan"), 1.0]})
    )
    vals = t.arrange("x").collect()["x"].tolist()
    assert math.isinf(vals[0]) and vals[0] < 0
    assert vals[1] == 1.0


def test_empty_and_long_strings(spark):
    long_s = "z" * 10_000
    t = from_pandas(spark, pd.DataFrame({"s": ["", "a", long_s]}))
    out = t.arrange(desc("s")).collect()["s"].tolist()
    assert out == [long_s, "a", ""]


def test_compute_persist_roundtrip(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [1, 2, 3]})).mutate(y="x * 2")
    c = t.compute()
    assert c.df.storageLevel.useMemory
    assert sorted(c.collect()["y"]) == [2, 4, 6]
    c.unpersist()


def test_collapse_barrier(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [1]})).collapse()
    assert t.collect()["x"].tolist() == [1]


def test_dim_and_repr(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [1, 2], "y": [3, 4]}))
    assert t.dim() == (2, 2)
    assert "x" in repr(t)


def test_relocate(spark):
    t = from_pandas(spark, pd.DataFrame({"a": [1], "b": [2], "c": [3]}))
    assert t.relocate("c").columns == ["c", "a", "b"]
    assert t.relocate("a", after="b").columns == ["b", "a", "c"]
    assert t.relocate("c", before="a").columns == ["c", "a", "b"]
