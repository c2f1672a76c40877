"""bind_rows / bind_cols / set ops (SURVEY §2.8) incl. the type
promotion lattice tests mirroring reference test-bind.R:129-228."""

import pandas as pd
import pyspark.sql.types as T
import pytest

from cuplyr_spark import from_pandas
from cuplyr_spark.schema import promote_types, unify_schemas


def test_bind_rows_by_name_null_fill(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [1, 2], "y": ["a", "b"]}))
    b = from_pandas(spark, pd.DataFrame({"y": ["c"], "z": [9.0]}))
    out = a.bind_rows(b)
    assert out.columns == ["x", "y", "z"]  # first table's order, then new
    pdf = out.collect()
    assert len(pdf) == 3
    assert pd.isna(pdf["z"][0]) and pd.isna(pdf["x"][2])


def test_bind_rows_promotion_int_double(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [1, 2]}))
    b = from_pandas(spark, pd.DataFrame({"x": [3.5]}))
    out = a.bind_rows(b)
    assert out.schema["x"].dataType == T.DoubleType()
    assert sorted(out.collect()["x"]) == [1.0, 2.0, 3.5]


def test_bind_rows_promotion_bool_int(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [True, False]}))
    b = from_pandas(spark, pd.DataFrame({"x": [5]}))
    out = a.bind_rows(b)
    assert out.schema["x"].dataType == T.LongType()
    assert sorted(out.collect()["x"]) == [0, 1, 5]


def test_bind_rows_promotion_to_string(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [1]}))
    b = from_pandas(spark, pd.DataFrame({"x": ["s"]}))
    out = a.bind_rows(b)
    assert out.schema["x"].dataType == T.StringType()


def test_bind_rows_id_column(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [1]}))
    b = from_pandas(spark, pd.DataFrame({"x": [2]}))
    out = a.bind_rows(b, id="src", labels=["first", "second"])
    pdf = out.collect().sort_values("x")
    assert out.columns[0] == "src"
    assert pdf["src"].tolist() == ["first", "second"]


def test_bind_rows_clears_groups(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [1]})).group_by("x")
    b = from_pandas(spark, pd.DataFrame({"x": [2]}))
    assert a.bind_rows(b).group_vars() == ()


def test_bind_rows_incompatible_types_raises(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [1]}))
    b = from_pandas(spark, pd.DataFrame({"x": pd.to_datetime(["2020-01-01"])}))
    with pytest.raises(TypeError):
        a.bind_rows(b)


def test_promote_types_lattice():
    assert promote_types(T.IntegerType(), T.LongType()) == T.LongType()
    assert promote_types(T.BooleanType(), T.DoubleType()) == T.DoubleType()
    assert promote_types(T.StringType(), T.LongType()) == T.StringType()
    assert promote_types(T.DateType(), T.TimestampType()) == T.TimestampType()
    assert promote_types(T.NullType(), T.IntegerType()) == T.IntegerType()


def test_unify_schemas_order():
    s1 = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    s2 = T.StructType([T.StructField("c", T.DoubleType()), T.StructField("a", T.DoubleType())])
    out = unify_schemas([s1, s2])
    assert [n for n, _ in out] == ["a", "b", "c"]
    assert dict(out)["a"] == T.DoubleType()


def test_bind_cols(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [1, 2, 3]}))
    b = from_pandas(spark, pd.DataFrame({"y": [4, 5, 6]}))
    out = a.bind_cols(b).collect().sort_values("x")
    assert out["y"].tolist() == [4, 5, 6]


def test_bind_cols_name_repair_unique(spark):
    """vctrs 'unique': EVERY occurrence of a duplicated name gets its
    1-based position suffix (reference test-bind.R:456-469)."""
    a = from_pandas(spark, pd.DataFrame({"x": [1], "b": [0]}))
    b = from_pandas(spark, pd.DataFrame({"x": [2]}))
    out = a.bind_cols(b)
    assert out.columns == ["x...1", "b", "x...3"]
    got = out.collect()
    assert got["x...1"].tolist() == [1] and got["x...3"].tolist() == [2]


def test_bind_cols_name_repair_check_unique(spark):
    """reference test-bind.R:471-481: error on duplicates."""
    a = from_pandas(spark, pd.DataFrame({"x": [1]}))
    b = from_pandas(spark, pd.DataFrame({"x": [2]}))
    import pytest

    with pytest.raises(ValueError, match="unique|duplicate"):
        a.bind_cols(b, name_repair="check_unique")
    # no duplicates -> passes through untouched
    c = from_pandas(spark, pd.DataFrame({"y": [2]}))
    assert a.bind_cols(c, name_repair="check_unique").columns == ["x", "y"]


def test_bind_cols_name_repair_minimal(spark):
    """reference test-bind.R:483-497: duplicates preserved (collect
    surfaces both columns; name-based selection would error, as the
    reference documents for tibble)."""
    a = from_pandas(spark, pd.DataFrame({"x": [1]}))
    b = from_pandas(spark, pd.DataFrame({"x": [2]}))
    out = a.bind_cols(b, name_repair="minimal")
    assert out.columns == ["x", "x"]


def test_bind_cols_name_repair_universal_and_callable(spark):
    a = from_pandas(spark, pd.DataFrame({"weird name": [1]}))
    b = from_pandas(spark, pd.DataFrame({"y": [2]}))
    assert a.bind_cols(b, name_repair="universal").columns == ["weird_name", "y"]
    out = a.bind_cols(b, name_repair=lambda n: n.upper())
    assert out.columns == ["WEIRD NAME", "Y"]


def test_bind_cols_keeps_first_groups(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [1]})).group_by("x")
    b = from_pandas(spark, pd.DataFrame({"y": [2]}))
    assert a.bind_cols(b).group_vars() == ("x",)


def test_set_ops(spark):
    a = from_pandas(spark, pd.DataFrame({"x": [1, 2, 2, 3]}))
    b = from_pandas(spark, pd.DataFrame({"x": [2, 3, 4]}))
    assert sorted(a.union(b).collect()["x"]) == [1, 2, 3, 4]
    assert sorted(a.intersect(b).collect()["x"]) == [2, 3]
    assert sorted(a.setdiff(b).collect()["x"]) == [1]
