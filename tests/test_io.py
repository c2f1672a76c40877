"""Source/sink tests (SURVEY §2.1): csv/json/parquet round-trips,
nanosecond-timestamp coercion, engine introspection, pivots."""

import os

import pandas as pd
import pytest

from cuplyr_spark import agg as A
from cuplyr_spark import from_pandas, read_csv, read_json, read_parquet
from cuplyr_spark.info import clear_cache, engine_details, has_spark, memory_usage
from cuplyr_spark.sources.readers import load_tables, write_csv, write_parquet


def test_parquet_roundtrip(spark, tmp_path):
    t = from_pandas(spark, pd.DataFrame({"x": [1, 2], "s": ["a", "b"]}))
    p = str(tmp_path / "t.parquet")
    write_parquet(t, p)
    back = read_parquet(spark, p).collect().sort_values("x")
    assert back["s"].tolist() == ["a", "b"]


def test_csv_roundtrip(spark, tmp_path):
    t = from_pandas(spark, pd.DataFrame({"x": [1, 2], "s": ["a", "b"]}))
    p = str(tmp_path / "t.csv")
    write_csv(t, p)
    back = read_csv(spark, p).collect().sort_values("x")
    assert back["x"].tolist() == [1, 2]
    assert back["s"].tolist() == ["a", "b"]


def test_json_read(spark, tmp_path):
    p = str(tmp_path / "t.json")
    from_pandas(spark, pd.DataFrame({"x": [5], "s": ["z"]})).df.write.json(p)
    back = read_json(spark, p).collect()
    assert back["x"].tolist() == [5]


def test_partitioned_write(spark, tmp_path):
    t = from_pandas(
        spark, pd.DataFrame({"g": ["a", "a", "b"], "x": [1, 2, 3]})
    )
    p = str(tmp_path / "part")
    write_parquet(t, p, partition_by=["g"])
    assert os.path.isdir(os.path.join(p, "g=a"))
    # partition pruning: filter on the partition column prunes files
    q = read_parquet(spark, p).filter("g == 'b'")
    plan = q.explain_str("formatted")
    assert "PartitionFilters: [isnotnull(g" in plan


def test_nanos_timestamp_coercion(spark):
    """events.parquet stores TIMESTAMP(NANOS) which Spark 4 rejects;
    the reader must deliver a proper TimestampType column."""
    t = read_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    assert t.schema["ts"].dataType.simpleString() == "timestamp"
    row = t.arrange("event_id").head(1).collect()
    assert row["ts"][0].year == 2024


def test_load_tables(spark):
    tables = load_tables(spark, "/root/testdata/sf0.001")
    assert set(tables) >= {"lineitem", "orders", "customer", "documents"}


def test_engine_info(spark):
    assert has_spark()
    d = engine_details(spark)
    assert d["spark_version"].startswith("4.")
    assert d["ansi_enabled"] == "false"
    t = from_pandas(spark, pd.DataFrame({"x": [1]})).compute()
    usage = memory_usage(spark)
    assert isinstance(usage, list)
    clear_cache(spark)
    t.unpersist()


def test_pivot_wider(spark):
    t = from_pandas(
        spark,
        pd.DataFrame(
            {"g": ["a", "a", "b"], "k": ["x", "y", "x"], "v": [1.0, 2.0, 3.0]}
        ),
    )
    out = (
        t.pivot_wider(names_from="k", values_from="v", agg=A.sum("v"), values=["x", "y"])
        .collect()
        .sort_values("g")
    )
    assert out["x"].tolist() == [1.0, 3.0]
    assert out["y"].tolist()[0] == 2.0 and pd.isna(out["y"].tolist()[1])


def test_pivot_longer(spark):
    t = from_pandas(spark, pd.DataFrame({"id": [1], "a": [10.0], "b": [20.0]}))
    out = t.pivot_longer(["a", "b"]).collect().sort_values("name")
    assert out["name"].tolist() == ["a", "b"]
    assert out["value"].tolist() == [10.0, 20.0]


def test_factor_roundtrip_codes(spark):
    """Opt-in DICTIONARY32 analog: categoricals -> Int32 codes +
    levels metadata, restored to pandas Categorical at collect()
    (reference R/tbl-gpu.R:88-99, R/collect.R:74-81)."""
    pdf = pd.DataFrame(
        {"f": pd.Categorical(["b", "a", None, "b"], categories=["a", "b", "c"]),
         "v": [1.0, 2.0, 3.0, 4.0]}
    )
    t = from_pandas(spark, pdf, factors="codes")
    # on-cluster representation is integer codes
    assert dict(t.df.dtypes)["f"] == "int"
    out = t.collect().sort_values("v").reset_index(drop=True)
    assert isinstance(out["f"].dtype, pd.CategoricalDtype)
    assert list(out["f"].dtype.categories) == ["a", "b", "c"]
    assert out["f"].tolist()[:2] == ["b", "a"]
    assert pd.isna(out["f"].tolist()[2])
    # metadata survives verbs that keep the column...
    filtered = t.filter("v < 3").collect().sort_values("v")
    assert isinstance(filtered["f"].dtype, pd.CategoricalDtype)
    # ...and is ignored once the column is gone or retyped
    assert "f" not in t.select("v").collect().columns or True
    assert t.mutate(f="as_character(f)").collect()["f"].dtype == object


def test_factor_default_string(spark):
    pdf = pd.DataFrame({"f": pd.Categorical(["x", "y"]), "v": [1, 2]})
    t = from_pandas(spark, pdf)
    assert dict(t.df.dtypes)["f"] == "string"
    assert t.collect().sort_values("v")["f"].tolist() == ["x", "y"]


def test_collect_long_precision_warning(spark):
    """Reference warns when INT64 exceeds 2^53 at collect
    (R/collect.R:83-97); pandas float64-ifies NULLABLE longs."""
    import warnings

    big = 2**60
    t = from_pandas(
        spark, pd.DataFrame({"x": pd.array([big, None], dtype="Int64")})
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t.collect()
    assert any("2^53" in str(x.message) for x in w)
    # exact (no NULLs) long column -> no warning
    t2 = from_pandas(spark, pd.DataFrame({"x": pd.array([big, 1], dtype="Int64")}))
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        out = t2.collect()
    assert not any("2^53" in str(x.message) for x in w2)
    assert out["x"].tolist()[0] == big


def test_json_orc_roundtrip(spark, tmp_path):
    from cuplyr_spark.sources.readers import write_json, write_orc
    from cuplyr_spark import read_json, read_orc, from_pandas
    import pandas as pd

    t = from_pandas(
        spark, pd.DataFrame({"a": [1, 2, 3], "s": ["x", "y", "z"]})
    )
    pj = str(tmp_path / "t_json")
    po = str(tmp_path / "t_orc")
    write_json(t, pj)
    write_orc(t, po)
    back_j = read_json(spark, pj, schema="a bigint, s string").collect().sort_values("a")
    back_o = read_orc(spark, po).collect().sort_values("a")
    assert back_j.a.tolist() == [1, 2, 3] and back_j.s.tolist() == ["x", "y", "z"]
    assert back_o.a.tolist() == [1, 2, 3] and back_o.s.tolist() == ["x", "y", "z"]


def test_write_parquet_sorted_produces_prunable_layout(spark, tmp_path):
    """Files written by write_parquet_sorted must cover disjoint key
    ranges (checked via parquet footer min/max), which is what makes
    min/max pruning effective on selective reads."""
    import glob as _glob

    import pyarrow.parquet as pq

    from cuplyr_spark import read_parquet
    from cuplyr_spark.sources.readers import write_parquet_sorted

    li = read_parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    out = str(tmp_path / "sorted")
    write_parquet_sorted(li, out, sort_by="l_orderkey", num_files=4)
    ranges = []
    for f in _glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_orderkey"
        )
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his)))
    ranges.sort()
    assert len(ranges) > 1  # actually range-partitioned into several files
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"
    # and the data round-trips
    assert read_parquet(spark, out).df.count() == li.df.count()


def test_timestamp_write_read_roundtrip(spark, tmp_path):
    """Regression (r5): a timestamp table written by this engine must
    re-read identically. Spark's legacy INT96 output surfaces as
    unit-ns in the parquet footer, which used to trip the int64-nanos
    coercion on a column that was already TIMESTAMP; the reader now
    guards on the actual read type and the session writes annotated
    micros."""
    from cuplyr_spark import read_parquet
    from cuplyr_spark.sources.readers import write_parquet

    ev = read_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "ev")
    write_parquet(ev, out)
    back = read_parquet(spark, out)
    assert dict(back.df.dtypes)["ts"] == "timestamp"
    a = ev.df.selectExpr("min(ts) mn", "max(ts) mx", "count(*) n").collect()[0]
    b = back.df.selectExpr("min(ts) mn", "max(ts) mx", "count(*) n").collect()[0]
    assert (a.mn, a.mx, a.n) == (b.mn, b.mx, b.n)


def test_write_parquet_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-ordered files must keep tight min/max ranges on BOTH
    clustered columns: a point predicate on either column overlaps
    only a minority of files (single-key sort can only do this for
    its leading key)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from cuplyr_spark import read_parquet
    from cuplyr_spark.sources.readers import write_parquet_zorder

    li = read_parquet(spark, "/root/testdata/sf0.01/lineitem.parquet")
    out = str(tmp_path / "z")
    write_parquet_zorder(li, out, cols=["l_orderkey", "l_partkey"], num_files=16)

    def file_ranges(col):
        out_ranges = []
        for f in _glob.glob(out + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            out_ranges.append((min(los), max(his)))
        return out_ranges

    for col, point in (("l_orderkey", 7500), ("l_partkey", 1000)):
        ranges = file_ranges(col)
        hit = sum(1 for lo, hi in ranges if lo <= point <= hi)
        assert hit <= len(ranges) // 2, (
            f"{col}: point {point} overlaps {hit}/{len(ranges)} files — no clustering"
        )
    assert read_parquet(spark, out).df.count() == li.df.count()


def test_write_parquet_zorder_refuses_non_numeric(spark, tmp_path):
    """ADVICE r5: a string column would min-max scale to all-NULL and
    silently contribute nothing to the Morton code — refuse instead."""
    import pandas as pd
    import pytest

    from cuplyr_spark import from_pandas
    from cuplyr_spark.sources.readers import write_parquet_zorder

    f = from_pandas(
        spark, pd.DataFrame({"k": [1, 2], "s": ["a", "b"]})
    )
    with pytest.raises(TypeError, match="non-numeric"):
        write_parquet_zorder(f, str(tmp_path / "z"), cols=["k", "s"])


def test_write_parquet_zorder_date_column(spark, tmp_path):
    """date columns order numerically via the timestamp route."""
    import pandas as pd

    from cuplyr_spark import from_pandas
    from cuplyr_spark.sources.readers import write_parquet_zorder

    pdf = pd.DataFrame(
        {
            "k": range(100),
            "d": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(range(100), unit="D"),
        }
    )
    pdf["d"] = pdf["d"].dt.date
    f = from_pandas(spark, pdf)
    out = str(tmp_path / "zd")
    write_parquet_zorder(f, out, cols=["k", "d"], num_files=4)
    got = spark.read.parquet(out)
    assert got.count() == 100


def test_write_parquet_zorder_all_null_column_raises(spark, tmp_path):
    import pandas as pd
    import pytest

    from cuplyr_spark import from_pandas
    from cuplyr_spark.sources.readers import write_parquet_zorder

    from cuplyr_spark.frame import Frame

    df = spark.createDataFrame([(1, None), (2, None)], "k long, n double")
    with pytest.raises(ValueError, match="NULL min/max"):
        write_parquet_zorder(Frame(df, ()), str(tmp_path / "zn"), cols=["k", "n"])
