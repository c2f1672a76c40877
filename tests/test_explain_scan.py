"""`explain_append_scan` — the manifest-pruning EXPLAIN. The contract
under test is DECISION PARITY: a segment the report marks `scan` is
opened by the real read with the same arguments, and a segment marked
`pruned` is not (proven the same way the zone-map tests prove
pruning: delete the pruned segment's directory and the read still
succeeds)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    append_snapshot,
    delete_append_rows,
    explain_append_scan,
    read_append_snapshot,
)


def _mk(spark, lo, hi, cat="x"):
    df = spark.range(lo, hi).select(
        F.col("id").cast("long").alias("k"),
        F.lit(cat).alias("cat"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    return Frame(df, ())


def _report(spark, d, **kw):
    return {
        r["segment"]: r.asDict()
        for r in explain_append_scan(spark, d, **kw).df.collect()
    }


def test_zone_map_prune_reason_and_parity(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 100), d)       # k in [0, 99]
    append_snapshot(_mk(spark, 1000, 1100), d)   # k in [1000, 1099]
    rep = _report(spark, d, stats_filter={"k": (">", 500)})
    assert len(rep) == 2
    actions = sorted((r["action"], r["pruned_by"]) for r in rep.values())
    assert actions == [("pruned", "zone_map"), ("scan", None)]
    pruned = [s for s, r in rep.items() if r["action"] == "pruned"][0]
    scanned = [s for s, r in rep.items() if r["action"] == "scan"][0]
    assert rep[scanned]["rows"] == 100 and rep[scanned]["live_rows"] == 100
    # parity proof: remove the pruned dir — the filtered read still works
    shutil.rmtree(str(tmp_path / "t" / pruned))
    got = read_append_snapshot(spark, d, stats_filter={"k": (">", 500)})
    assert got.df.count() == 100


def test_where_derivation_matches_dict_form(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 100), d)
    append_snapshot(_mk(spark, 1000, 1100), d)
    via_where = _report(spark, d, where="k > 500 and v < 1e9")
    via_dict = _report(spark, d, stats_filter={"k": (">", 500)})
    assert {s: r["action"] for s, r in via_where.items()} == {
        s: r["action"] for s, r in via_dict.items()
    }
    # underivable predicate: full scan, exactly like the read
    rep = _report(spark, d, where="k + v > 500")
    assert all(r["action"] == "scan" for r in rep.values())


def test_fully_deleted_reason(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 100), d)
    append_snapshot(_mk(spark, 1000, 1100), d)
    delete_append_rows(spark, d, "k >= 1000")
    rep = _report(spark, d)
    assert sorted((r["action"], r["pruned_by"]) for r in rep.values()) == [
        ("pruned", "fully_deleted"), ("scan", None),
    ]
    dead = [s for s, r in rep.items() if r["pruned_by"] == "fully_deleted"][0]
    assert rep[dead]["live_rows"] == 0 and rep[dead]["delete_count"] == 100
    assert rep[dead]["dv_files"] >= 1


def test_partition_prune_reason(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 10, cat="a"), d, partition_by="cat")
    append_snapshot(_mk(spark, 10, 20, cat="b"), d)
    rep = _report(spark, d, partition_filter={"cat": "a"})
    assert sorted((r["action"], r["pruned_by"]) for r in rep.values()) == [
        ("pruned", "partition"), ("scan", None),
    ]
    assert all(r["partition_dirs"] == 1 for r in rep.values())
    # where= derives the same partition decision
    rep2 = _report(spark, d, where="cat == 'a'")
    assert {s: r["action"] for s, r in rep2.items()} == {
        s: r["action"] for s, r in rep.items()
    }


def test_bloom_prune_reason(spark, tmp_path):
    d = str(tmp_path / "t")
    spec = {"bloom": {"k": [1 << 16, 5]}}
    # interleaved ranges: min/max zone maps cannot separate them, the
    # bloom sidecar can
    a = Frame(spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), F.lit("x").alias("cat"),
        F.lit(0.0).alias("v")), ())
    b = Frame(spark.range(1, 2000, 2).select(
        F.col("id").alias("k"), F.lit("x").alias("cat"),
        F.lit(0.0).alias("v")), ())
    append_snapshot(a, d, sketch_spec=spec)
    append_snapshot(b, d, sketch_spec=spec)
    rep = _report(spark, d, stats_filter={"k": 401})  # odd keys only... 401 is odd
    by_reason = sorted((r["action"], r["pruned_by"]) for r in rep.values())
    assert by_reason == [("pruned", "bloom"), ("scan", None)]


def test_guards_and_fold_kind(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 10), d)
    with pytest.raises(ValueError, match="unpartitioned"):
        explain_append_scan(spark, d, partition_filter={"cat": "a"})
    with pytest.raises(FileNotFoundError):
        explain_append_scan(spark, str(tmp_path / "nope"))
    from cuplyr_spark.sources.connectors import compact_append_snapshot
    append_snapshot(_mk(spark, 10, 20), d)
    compact_append_snapshot(spark, d, target_file_bytes=1 << 30)
    rep = _report(spark, d)
    assert {r["kind"] for r in rep.values()} == {"fold"}


def test_version_pinning(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 10), d)
    append_snapshot(_mk(spark, 10, 20), d)
    assert len(_report(spark, d, version=1)) == 1
    assert len(_report(spark, d)) == 2
