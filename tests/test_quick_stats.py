"""`append_quick_stats` — the optimized-metadata-query analog: exact
live-row counts and sound (flagged-exact) column bounds from the
manifest alone, zero data IO. The zero-IO claim is proven the
zone-map way: delete every segment directory and the numbers still
come back."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    append_quick_stats,
    append_snapshot,
    compact_append_snapshot,
    delete_append_rows,
)


def _mk(spark, lo, hi):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") * 2.0)
        .alias("v"),
        F.concat(F.lit("tag-"), (F.col("id") % 4).cast("string")).alias("t"),
    )
    return Frame(df, ())


def test_exact_count_and_bounds_without_io(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 1000), d)
    append_snapshot(_mk(spark, 1000, 2500), d)
    # zero-IO proof: the data is GONE, only the manifest remains
    for seg in ["seg=1", "seg=2"]:
        for p in (tmp_path / "t").glob(f"{seg}-*"):
            shutil.rmtree(str(p))
    st = append_quick_stats(spark, d)
    assert st["rows"] == 2500 and st["segments"] == 2
    k = st["cols"]["k"]
    assert (k["min"], k["max"], k["null_count"], k["exact"]) == (
        0, 2499, 0, True,
    )
    v = st["cols"]["v"]
    assert v["min"] == 2.0 and v["max"] == 4998.0
    assert v["null_count"] == 250 and v["exact"]
    t = st["cols"]["t"]
    assert (t["min"], t["max"], t["exact"]) == ("tag-0", "tag-3", True)


def test_deletes_keep_count_exact_but_demote_bounds(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 1000), d)
    delete_append_rows(spark, d, {"k": ("<", 100)})
    st = append_quick_stats(spark, d)
    assert st["rows"] == 900  # exact under merge-on-read deletes
    k = st["cols"]["k"]
    # bounds stay sound (the true min is now 100, 0 is a lower bound)
    assert k["min"] == 0 and k["max"] == 999
    assert k["exact"] is False and k["null_count"] is None
    # purge compaction materializes the deletes: exactness returns
    compact_append_snapshot(spark, d, purge_deletes=True)
    st2 = append_quick_stats(spark, d)
    assert st2["rows"] == 900
    k2 = st2["cols"]["k"]
    assert (k2["min"], k2["max"], k2["exact"]) == (100, 999, True)


def test_long_string_bounds_are_flagged_inexact(spark, tmp_path):
    d = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.concat(
            F.lpad(F.col("id").cast("string"), 5, "0"), F.lit("x" * 80)
        ).alias("s"),
    )
    append_snapshot(Frame(df, ()), d)
    st = append_quick_stats(spark, d)
    s = st["cols"]["s"]
    # truncated bounds: still sound (prefix <= value <= bumped prefix)
    assert s["min"] <= "00000" + "x" * 80
    assert s["max"] >= "00099" + "x" * 80
    assert s["exact"] is False
    assert st["cols"]["k"]["exact"] is True


def test_time_travel_and_missing_stats(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 500), d)
    append_snapshot(_mk(spark, 500, 800), d, collect_stats=False)
    # current version: one segment without stats -> rows unknowable
    st = append_quick_stats(spark, d)
    assert st["rows"] is None and st["cols"] == {}
    # the pinned earlier version is fully covered
    st1 = append_quick_stats(spark, d, version=1)
    assert st1["rows"] == 500 and st1["cols"]["k"]["max"] == 499
    with pytest.raises(FileNotFoundError):
        append_quick_stats(spark, str(tmp_path / "nope"))
