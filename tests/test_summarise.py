"""Grouping + aggregation tests vs DuckDB oracle (SURVEY §2.6)."""

import os

import pandas as pd
import pytest

from cuplyr_spark import agg as A
from cuplyr_spark import from_pandas, read_parquet
from tests.helpers import assert_frame_matches, oracle


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))


def test_grouped_summarise_all_aggs(lineitem, duck):
    got = (
        lineitem.group_by("l_returnflag", "l_linestatus")
        .summarise(
            sum_qty=A.sum("l_quantity"),
            avg_price=A.mean("l_extendedprice"),
            min_disc=A.min("l_discount"),
            max_tax=A.max("l_tax"),
            n=A.n(),
            sd_qty=A.sd("l_quantity"),
            var_qty=A.var("l_quantity"),
        )
        .collect()
    )
    want = oracle(
        duck,
        """SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               avg(l_extendedprice) AS avg_price,
               min(l_discount) AS min_disc,
               max(l_tax) AS max_tax,
               count(*) AS n,
               stddev_samp(l_quantity) AS sd_qty,
               var_samp(l_quantity) AS var_qty
           FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    )
    assert_frame_matches(got, want, rel=1e-9)


def test_group_cols_come_first(lineitem):
    out = lineitem.group_by("l_returnflag").summarise(n=A.n())
    assert out.columns == ["l_returnflag", "n"]
    assert out.group_vars() == ()  # .groups="drop"


def test_ungrouped_summarise_one_row(lineitem, duck):
    got = lineitem.summarise(n=A.n(), total=A.sum("l_quantity")).collect()
    want = oracle(duck, "SELECT count(*) AS n, sum(l_quantity) AS total FROM lineitem")
    assert len(got) == 1
    assert_frame_matches(got, want)


def test_expression_in_aggregate(lineitem, duck):
    """sum(pred) / mean(pred) — reference R/summarise.R:204-397."""
    got = (
        lineitem.group_by("l_returnflag")
        .summarise(
            n_big=A.sum("l_quantity > 40"),
            frac_big=A.mean("l_quantity > 40"),
            max_rev=A.max("l_extendedprice * (1 - l_discount)"),
        )
        .collect()
    )
    want = oracle(
        duck,
        """SELECT l_returnflag,
               sum(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS n_big,
               avg(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS frac_big,
               max(l_extendedprice * (1 - l_discount)) AS max_rev
           FROM lineitem GROUP BY l_returnflag""",
    )
    assert_frame_matches(got, want)


def test_result_types(lineitem):
    """sum(int)->long, mean->double, n->long, min/max preserve
    (reference R/summarise.R:490-503)."""
    out = lineitem.group_by("l_returnflag").summarise(
        s_int=A.sum("l_linenumber"),
        s_dbl=A.sum("l_quantity"),
        m=A.mean("l_linenumber"),
        n=A.n(),
        mn=A.min("l_linenumber"),
        mx=A.max("l_quantity"),
    )
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["s_int"] == "bigint"
    assert types["s_dbl"] == "double"
    assert types["m"] == "double"
    assert types["n"] == "bigint"
    assert types["mn"] == "int"
    assert types["mx"] == "double"


def test_na_semantics(spark):
    """sum/mean/min/max exclude NULLs; n() counts all rows."""
    t = from_pandas(spark, pd.DataFrame({"g": ["a", "a", "a"], "x": [1.0, None, 3.0]}))
    out = t.group_by("g").summarise(s=A.sum("x"), m=A.mean("x"), n=A.n(), c=A.count("x")).collect()
    assert out["s"].tolist() == [4.0]
    assert out["m"].tolist() == [2.0]
    assert out["n"].tolist() == [3]  # includes the NULL row
    assert out["c"].tolist() == [2]  # count(col) excludes NULLs


def test_sum_boolean_column(spark):
    """dplyr sum(logical) counts TRUEs — bool cast applies to plain
    boolean columns too, not only comparison expressions."""
    t = from_pandas(spark, pd.DataFrame({"b": [True, False, True]}))
    out = t.summarise(s=A.sum("b")).collect()
    assert out["s"].tolist() == [2]


def test_group_by_add(lineitem):
    g = lineitem.group_by("l_returnflag").group_by("l_linestatus", add=True)
    assert g.group_vars() == ("l_returnflag", "l_linestatus")
    assert lineitem.group_by("l_returnflag").group_by("l_linestatus").group_vars() == (
        "l_linestatus",
    )


def test_ungroup(lineitem):
    assert lineitem.group_by("l_returnflag").ungroup().group_vars() == ()


def test_count_verb(lineitem, duck):
    got = lineitem.count("l_returnflag", "l_linestatus").collect()
    want = oracle(
        duck,
        "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY 1, 2",
    )
    assert_frame_matches(got, want)


def test_n_distinct(lineitem, duck):
    got = lineitem.summarise(d=A.n_distinct("l_orderkey")).collect()
    want = oracle(duck, "SELECT count(DISTINCT l_orderkey) AS d FROM lineitem")
    assert_frame_matches(got, want)


def test_summarise_on_all_null_group(spark):
    t = from_pandas(spark, pd.DataFrame({"g": ["a", "a"], "x": [None, None]}, dtype=object).astype({"g": str}))
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("g", T.StringType()), T.StructField("x", T.DoubleType())]
    )
    t = from_pandas(spark, pd.DataFrame({"g": ["a", "a"], "x": [None, None]}), schema=schema)
    out = t.group_by("g").summarise(s=A.sum("x"), n=A.n()).collect()
    assert pd.isna(out["s"][0])
    assert out["n"].tolist() == [2]


def test_packed_int_key_groupby_matches_unpacked(spark):
    """The 2-int-key packing fast path (summarise) must be invisible:
    same rows as composite-key groupBy for every int32 pair, including
    negatives (arithmetic shiftright + low-32 cast unpack)."""
    from pyspark.sql import functions as F

    from cuplyr_spark.frame import Frame

    df = spark.range(10000).select(
        # coalesce clears the nullable flag `%` introduces; negatives included
        F.coalesce(((F.col("id") % 7) - 3).cast("int"), F.lit(0)).alias("a"),
        F.coalesce(((F.col("id") % 5) - 2).cast("int"), F.lit(0)).alias("b"),
        F.coalesce((F.col("id") % 100).cast("double"), F.lit(0.0)).alias("v"),
    )
    assert not df.schema["a"].nullable and not df.schema["b"].nullable
    f = Frame(df).group_by("a", "b")
    packed = f.summarise(s=A.sum("v"), n=A.n())
    # packed path engaged: plan groups on one synthetic long key
    assert "__cuplyr_pk__" in packed.df._jdf.queryExecution().analyzed().toString()
    got = packed.collect().sort_values(["a", "b"]).reset_index(drop=True)
    want = (
        df.groupBy("a", "b")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    assert list(got.columns) == ["a", "b", "s", "n"]


def test_packed_path_skips_non_int_and_overflow(spark):
    from pyspark.sql import functions as F

    from cuplyr_spark.frame import Frame

    pdf = pd.DataFrame({"a": [1, None], "b": [2, 2], "v": [1.0, 2.0]})
    f = from_pandas(spark, pdf)  # float (from None) keys -> normal path
    out = f.group_by("a", "b").summarise(n=A.n())
    assert "__cuplyr_pk__" not in out.df._jdf.queryExecution().analyzed().toString()
    assert len(out.collect()) == 2  # NULL stays its own group

    # two NULLABLE int32 keys need 32+32+2 = 66 bits -> fall back
    df = spark.range(10).select(
        (F.col("id") % 3).cast("int").alias("a"),
        (F.col("id") % 2).cast("int").alias("b"),
    )
    df = df.withColumn("a", F.when(F.col("a") > 0, F.col("a")))  # nullable
    assert df.schema["a"].nullable
    out2 = Frame(df).group_by("a", "b").summarise(n=A.n())
    assert "__cuplyr_pk__" not in out2.df._jdf.queryExecution().analyzed().toString()

    # three int32 keys need 96 bits -> fall back
    df3 = spark.range(10).select(
        *[
            F.coalesce((F.col("id") % m).cast("int"), F.lit(0)).alias(n)
            for n, m in (("a", 3), ("b", 2), ("c", 5))
        ]
    )
    out3 = Frame(df3).group_by("a", "b", "c").summarise(n=A.n())
    assert "__cuplyr_pk__" not in out3.df._jdf.queryExecution().analyzed().toString()


def test_packed_three_key_groupby_matches_unpacked(spark):
    """3-key packing (int32 + short + short = 64 bits exactly) must
    match the composite-key groupBy, negatives included."""
    from pyspark.sql import functions as F

    from cuplyr_spark.frame import Frame

    df = spark.range(20000).select(
        F.coalesce(((F.col("id") % 1000) - 500).cast("int"), F.lit(0)).alias("a"),
        F.coalesce(((F.col("id") % 7) - 3).cast("short"), F.lit(0).cast("short")).alias("b"),
        F.coalesce(((F.col("id") % 5) - 2).cast("short"), F.lit(0).cast("short")).alias("c"),
        F.coalesce((F.col("id") % 100).cast("double"), F.lit(0.0)).alias("v"),
    )
    assert not any(df.schema[k].nullable for k in ("a", "b", "c"))
    f = Frame(df).group_by("a", "b", "c")
    packed = f.summarise(s=A.sum("v"), n=A.n())
    assert "__cuplyr_pk__" in packed.df._jdf.queryExecution().analyzed().toString()
    got = packed.collect().sort_values(["a", "b", "c"]).reset_index(drop=True)
    want = (
        df.groupBy("a", "b", "c")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values(["a", "b", "c"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    assert list(got.columns) == ["a", "b", "c", "s", "n"]


def test_packed_nullable_keys_sentinel_bit(spark):
    """Nullable keys pack when the sentinel bits fit: NULL stays its
    own group, distinct from value 0, and round-trips to NULL."""
    from pyspark.sql import functions as F

    from cuplyr_spark.frame import Frame

    df = spark.range(1000).select(
        # a in {NULL, 0, 1}: NULL-vs-0 is exactly the collision a naive
        # coalesce(key, 0) pack would create
        F.when(F.col("id") % 3 == 0, (F.col("id") % 2).cast("short")).alias("a"),
        F.coalesce(((F.col("id") % 4) - 2).cast("short"), F.lit(0).cast("short")).alias("b"),
        F.lit(1.0).alias("v"),
    )
    assert df.schema["a"].nullable
    f = Frame(df).group_by("a", "b")
    packed = f.summarise(s=A.sum("v"), n=A.n())
    assert "__cuplyr_pk__" in packed.df._jdf.queryExecution().analyzed().toString()
    got = packed.collect().sort_values(["a", "b"], na_position="last").reset_index(drop=True)
    want = (
        df.groupBy("a", "b")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # NULL and 0 groups both present for a
    avals = set(got["a"].tolist())
    assert 0 in avals and any(pd.isna(x) for x in got["a"])
