"""Round-12 storage features: metadata-only (v2) deletion-vector
addressing for partitioned tables with legacy-layout fallback, DV
maintenance merges, additive append-table schema evolution,
predicate-derived stats pruning, the partitioned streaming tail, CDF
insert-batching, and the ADVICE fixes (partition_filter value forms,
separate_rows type conversion, gapfill bucket whitelist, upsert on
stat-ineligible keys).

The reference has no storage layer (SURVEY.md §2.1); the designs here
are public art — Delta deletion vectors / mergeSchema / CDF — rebuilt
jar-free on the log manifest."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

import cuplyr_spark.sources.connectors as C
from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    _derive_stats_filter,
    _normalize_pfilter,
    append_snapshot,
    compact_append_snapshot,
    delete_append_rows,
    merge_append_dvs,
    read_append_cdf,
    read_append_snapshot,
    update_append_rows,
    upsert_append_rows,
)


def _log(d, v):
    # manifests are delta records since the checkpointing rework:
    # materialize through the reader
    from cuplyr_spark.sources.connectors import _read_log, _TableFS

    return _read_log(_TableFS(d), v)


def _latest(d):
    with open(os.path.join(d, "_LATEST_LOG")) as f:
        return _log(d, int(f.read().strip()))


def _mk_part(spark, tmp_path, name, n=100):
    d = str(tmp_path / name)
    shutil.rmtree(d, ignore_errors=True)
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 2.0).alias("v"),
    )
    append_snapshot(
        Frame(df.filter(f"id < {n // 2}"), ()), d, batch_id=0,
        partition_by="p",
    )
    append_snapshot(Frame(df.filter(f"id >= {n // 2}"), ()), d, batch_id=1)
    return d


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# -- v2 partitioned DV addressing ----------------------------------------


def test_partitioned_delete_writes_dv2_layout(spark, tmp_path):
    d = _mk_part(spark, tmp_path, "dv2a")
    v, n = delete_append_rows(spark, d, {"id": ("<", 10)})
    assert n == 10
    log = _latest(d)
    dirs = {x for files in log["deletes"].values() for x in files}
    assert all(x.rsplit("/", 1)[-1].startswith("dv2=") for x in dirs)
    # the DV parquet carries the v2 address columns
    dv = spark.read.parquet(os.path.join(d, next(iter(dirs))))
    assert sorted(dv.columns) == ["file", "part", "pos", "seg"]
    assert dv.filter("part is null").count() == 0
    got = read_append_snapshot(spark, d).df
    assert got.count() == 90
    assert got.filter("id < 10").count() == 0


def test_partitioned_dv_read_plan_has_no_regexp(spark, tmp_path):
    d = _mk_part(spark, tmp_path, "dv2plan")
    delete_append_rows(spark, d, {"id": ("<", 10)})
    out = read_append_snapshot(spark, d).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "regexp_extract" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_partitioned_dv_disambiguates_same_basename(spark, tmp_path):
    # ONE write job spraying every partition from one task produces the
    # SAME basename in every partition dir — the case basename+pos
    # alone cannot address and the partition composite must split
    d = str(tmp_path / "dv2same")
    df = (
        spark.range(90)
        .select(F.col("id"), (F.col("id") % 3).cast("string").alias("p"))
        .coalesce(1)
    )
    append_snapshot(Frame(df, ()), d, batch_id=0, partition_by="p")
    seg = _latest(d)["segments"][0]
    names = {
        f
        for sub in os.listdir(os.path.join(d, seg))
        if sub.startswith("p=")
        for f in os.listdir(os.path.join(d, seg, sub))
        if f.endswith(".parquet")
    }
    assert len(names) == 1, "precondition: basenames must collide"
    v, n = delete_append_rows(spark, d, partition_filter={"p": "1"})
    assert n == 30
    got = read_append_snapshot(spark, d).df
    assert got.count() == 60
    assert got.filter("p = '1'").count() == 0
    assert got.filter("id % 3 = 1").count() == 0


def test_legacy_dv_layout_still_applies(spark, tmp_path):
    # simulate a table written by the pre-v2 layer: a dv= file whose
    # `file` column is the path-within-segment (partition dir +
    # basename), referenced from the log — the read must still apply it
    d = _mk_part(spark, tmp_path, "dvleg")
    log = _latest(d)
    seg = log["segments"][0]
    files = []
    for sub in sorted(os.listdir(os.path.join(d, seg))):
        if sub.startswith("p="):
            for f in sorted(os.listdir(os.path.join(d, seg, sub))):
                if f.endswith(".parquet"):
                    files.append(f"{sub}/{f}")
    legacy = spark.createDataFrame(
        [(seg, files[0], 0)], "seg string, file string, pos bigint"
    )
    rel = "_delete/dv=99-legacy0"
    legacy.coalesce(1).write.parquet(os.path.join(d, rel))
    new = dict(log)
    new["version"] = log["version"] + 1
    new["deletes"] = {seg: [rel]}
    new["delete_counts"] = {seg: 1}
    with open(os.path.join(d, f"_LOG.{new['version']}"), "w") as f:
        json.dump(new, f)
    with open(os.path.join(d, "_LATEST_LOG"), "w") as f:
        f.write(str(new["version"]))
    got = read_append_snapshot(spark, d).df
    assert got.count() == 99  # exactly the one legacy-addressed row gone
    # a NEW delete (v2 layout) coexists with the legacy file
    v, n = delete_append_rows(spark, d, {"id": (">=", 95)})
    assert n == 5
    got = read_append_snapshot(spark, d).df
    assert got.count() == 94
    fams = {
        x.rsplit("/", 1)[-1].split("=")[0]
        for fl in _latest(d)["deletes"].values()
        for x in fl
    }
    assert fams == {"dv", "dv2"}


# -- DV maintenance merge -------------------------------------------------


def test_merge_append_dvs_folds_to_one_dir(spark, tmp_path):
    d = _mk_part(spark, tmp_path, "dvm")
    for i in range(5):
        delete_append_rows(spark, d, {"id": [(">=", i * 4), ("<", i * 4 + 4)]})
    before = _latest(d)
    before_counts = dict(before["delete_counts"])
    snap_before = _rows(read_append_snapshot(spark, d).df)
    cdf_before = _rows(read_append_cdf(spark, d, since_version=0).df)
    assert max(len(v) for v in before["deletes"].values()) >= 2
    mv = merge_append_dvs(spark, d)
    assert mv == before["version"] + 1
    after = _latest(d)
    assert all(len(v) == 1 for v in after["deletes"].values())
    assert all(
        x.rsplit("/", 1)[-1].startswith("dvm2=")
        for fl in after["deletes"].values()
        for x in fl
    )
    # counts untouched, reads byte-identical, CDF unchanged (the merge
    # is dataChange=false — no re-emitted deletes)
    assert after["delete_counts"] == before_counts
    assert _rows(read_append_snapshot(spark, d).df) == snap_before
    assert _rows(read_append_cdf(spark, d, since_version=0).df) == cdf_before
    # idempotent: nothing left to merge
    assert merge_append_dvs(spark, d) is None


def test_merge_append_dvs_respects_min_dvs(spark, tmp_path):
    d = _mk_part(spark, tmp_path, "dvm2")
    delete_append_rows(spark, d, {"id": ("<", 3)})
    assert merge_append_dvs(spark, d) is None  # one dir: churn, skip
    with pytest.raises(ValueError):
        merge_append_dvs(spark, d, min_dvs=1)


def test_purge_clears_merged_dvs(spark, tmp_path):
    d = _mk_part(spark, tmp_path, "dvm3")
    delete_append_rows(spark, d, {"id": ("<", 5)})
    delete_append_rows(spark, d, {"id": [(">=", 5), ("<", 8)]})
    merge_append_dvs(spark, d)
    snap = _rows(read_append_snapshot(spark, d).df)
    compact_append_snapshot(spark, d, purge_deletes=True, target_file_bytes=1)
    log = _latest(d)
    assert not log.get("deletes")
    assert _rows(read_append_snapshot(spark, d).df) == snap


# -- additive schema evolution ---------------------------------------------


def _mk_evo(spark, tmp_path, name):
    d = str(tmp_path / name)
    shutil.rmtree(d, ignore_errors=True)
    v1 = spark.range(100).select(F.col("id"), (F.col("id") * 2.0).alias("v"))
    append_snapshot(Frame(v1, ()), d, batch_id=0)
    return d


def test_append_schema_merge_adds_column(spark, tmp_path):
    d = _mk_evo(spark, tmp_path, "evo1")
    v2 = spark.range(100, 200).select(
        F.col("id"), (F.col("id") * 2.0).alias("v"), F.lit("en").alias("lang")
    )
    with pytest.raises(ValueError, match="schema_mode"):
        append_snapshot(Frame(v2, ()), d, batch_id=1)
    append_snapshot(Frame(v2, ()), d, batch_id=1, schema_mode="merge")
    out = read_append_snapshot(spark, d).df
    assert out.columns == ["id", "v", "lang"]
    assert out.count() == 200
    assert out.filter("lang is null").count() == 100
    # pre-evolution segment got the exact all-NULL stats stamp
    log = _latest(d)
    old = [
        s
        for s in log["segments"]
        if log["stats"][s]["cols"].get("lang") == [None, None, 100]
    ]
    assert len(old) == 1
    # comparison on the new column prunes the pre-evolution segment
    seen = []
    orig = C._seg_stats_match
    try:
        C._seg_stats_match = lambda st, f: seen.append(1) or orig(st, f)
        got = read_append_snapshot(spark, d, stats_filter={"lang": "en"}).df
        assert got.count() == 100
    finally:
        C._seg_stats_match = orig


def test_append_schema_merge_refuses_type_change(spark, tmp_path):
    d = _mk_evo(spark, tmp_path, "evo2")
    bad = spark.range(5).select(F.col("id"), F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="type"):
        append_snapshot(Frame(bad, ()), d, batch_id=1, schema_mode="merge")


def test_append_schema_merge_allows_missing_columns(spark, tmp_path):
    d = _mk_evo(spark, tmp_path, "evo3")
    only_id = spark.range(200, 250).select(F.col("id"))
    append_snapshot(Frame(only_id, ()), d, batch_id=1, schema_mode="merge")
    out = read_append_snapshot(spark, d).df
    assert out.count() == 150
    assert out.filter("id >= 200 and v is null").count() == 50
    # stats for the omitted column on the new segment: all-NULL exact
    log = _latest(d)
    st = log["stats"][log["segments"][-1]]
    assert st["cols"]["v"] == [None, None, 50]


def test_schema_merge_partition_column_required(spark, tmp_path):
    d = str(tmp_path / "evo4")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("p")
    )
    append_snapshot(Frame(df, ()), d, batch_id=0, partition_by="p")
    with pytest.raises(ValueError, match="partition"):
        append_snapshot(
            Frame(df.select("id"), ()), d, batch_id=1, schema_mode="merge"
        )


def test_evolution_cdf_and_row_level_writes(spark, tmp_path):
    d = _mk_evo(spark, tmp_path, "evo5")
    v2 = spark.range(100, 200).select(
        F.col("id"), (F.col("id") * 2.0).alias("v"), F.lit("en").alias("lang")
    )
    append_snapshot(Frame(v2, ()), d, batch_id=1, schema_mode="merge")
    v, n = delete_append_rows(spark, d, {"lang": "en"})
    assert n == 100
    assert read_append_snapshot(spark, d).df.count() == 100
    cdf = read_append_cdf(spark, d, since_version=0).df
    assert cdf.columns == ["id", "v", "lang", "_change_type", "_commit_version"]
    agg = {
        (r["_change_type"], r["_commit_version"]): r["n"]
        for r in cdf.groupBy("_change_type", "_commit_version")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert agg == {("insert", 1): 100, ("insert", 2): 100, ("delete", 3): 100}
    # UPDATE backfills a brand-new column for matching rows
    v, n = update_append_rows(
        spark, d, "id < 10", {"score": "v + 1"}, schema_mode="merge"
    )
    assert n == 10
    out = read_append_snapshot(spark, d).df
    assert out.columns == ["id", "v", "lang", "score"]
    assert out.filter("score is not null").count() == 10
    with pytest.raises(ValueError, match="fixed-schema"):
        update_append_rows(spark, d, "id < 5", {"other": "1"})
    # upsert with an extra column grows the schema too
    batch = spark.range(3).select(
        F.col("id"),
        F.lit(0.0).alias("v"),
        F.lit("fr").alias("lang"),
        F.lit(9.0).alias("score"),
        F.lit(1).alias("extra"),
    )
    v, rep, app = upsert_append_rows(
        Frame(batch, ()), d, key="id", schema_mode="merge"
    )
    assert (rep, app) == (3, 3)
    out = read_append_snapshot(spark, d).df
    assert out.columns == ["id", "v", "lang", "score", "extra"]
    assert out.filter("extra is not null").count() == 3


# -- predicate-derived stats pruning ---------------------------------------


def test_derive_stats_filter_grammar():
    schema = [
        ["id", "bigint"], ["v", "double"], ["cat", "string"],
        ["ts", "timestamp"], ["d", "date"], ["b", "boolean"],
        ["dec", "decimal(10,2)"],
    ]
    f = lambda s: _derive_stats_filter(s, schema)  # noqa: E731
    assert f("id > 100 and cat == 'a'") == {
        "id": [(">", 100)], "cat": [("==", "a")],
    }
    assert f("100 < id") == {"id": [(">", 100)]}
    assert f("v <= -1.5 and cat in ['a', 'b']") == {
        "v": [("<=", -1.5)], "cat": [("in", ["a", "b"])],
    }
    # string literals on temporal columns re-render into the zone-map
    # domain (a bare date sorts BELOW its own midnight lexicographically)
    assert f("ts <= '2024-06-01'") == {"ts": [("<=", "2024-06-01T00:00:00")]}
    assert f("d == '2024-06-01'") == {"d": [("==", "2024-06-01")]}
    # underivable shapes degrade, never misderive
    assert f("id > 100 or cat == 'a'") is None
    assert f("id % 7 == 0") is None
    assert f("id > v") is None
    assert f("id > 'x'") is None  # literal/column type mismatch
    assert f("b == True") is None  # booleans excluded
    # decimals derive into the unscaled-int stats domain (r13);
    # literals finer than the column scale stay underivable
    assert f("dec > 1") == {"dec": [(">", 100)]}
    assert f("dec == 1.25") == {"dec": [("==", 125)]}
    assert f("dec > 1.005") is None
    assert f("not a predicate ===") is None
    # partial derivation keeps the derivable conjunct
    assert f("id > 100 and foo(v) < 2") == {"id": [(">", 100)]}


def test_string_predicate_delete_prunes_segments(spark, tmp_path):
    d = str(tmp_path / "sder")
    lo = spark.range(100).select(F.col("id"), (F.col("id") * 1.0).alias("v"))
    hi = spark.range(1000, 1100).select(
        F.col("id"), (F.col("id") * 1.0).alias("v")
    )
    append_snapshot(Frame(lo, ()), d, batch_id=0)
    append_snapshot(Frame(hi, ()), d, batch_id=1)
    seen = []
    orig = C._scan_with_dv
    try:
        C._scan_with_dv = (
            lambda spark, fs, log, segs, **kw: seen.append(list(segs))
            or orig(spark, fs, log, segs, **kw)
        )
        v, n = delete_append_rows(spark, d, "id >= 1050 and id % 2 == 0")
    finally:
        C._scan_with_dv = orig
    assert n == 25
    assert len(seen) == 1 and len(seen[0]) == 1  # low segment never opened
    assert read_append_snapshot(spark, d).df.count() == 175


def test_read_append_snapshot_where(spark, tmp_path):
    d = str(tmp_path / "swhere")
    df = spark.range(100).select(F.col("id"), (F.col("id") * 1.0).alias("v"))
    append_snapshot(Frame(df, ()), d, batch_id=0)
    got = read_append_snapshot(spark, d, where="id < 50 and id % 2 == 0").df
    assert got.count() == 25
    # underivable predicate still returns exact results (full scan)
    got = read_append_snapshot(spark, d, where="id < 10 or id >= 95").df
    assert got.count() == 15


# -- CDF insert batching ----------------------------------------------------


def test_cdf_batches_contiguous_insert_versions(spark, tmp_path):
    d = str(tmp_path / "cdfb")
    for i in range(3):
        df = spark.range(i * 10, i * 10 + 10).select(
            F.col("id"), (F.col("id") * 1.0).alias("v")
        )
        append_snapshot(Frame(df, ()), d, batch_id=i)
    cdf = read_append_cdf(spark, d, since_version=0).df
    plan = cdf._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # one relation for 3 versions
    agg = {
        r["_commit_version"]: (r["n"], r["lo"], r["hi"])
        for r in cdf.groupBy("_commit_version")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
        )
        .collect()
    }
    assert agg == {1: (10, 0, 9), 2: (10, 10, 19), 3: (10, 20, 29)}


# -- partitioned streaming tail ---------------------------------------------


def test_stream_append_log_partitioned(spark, tmp_path):
    from cuplyr_spark.streaming.stream import stream_append_log

    d = str(tmp_path / "sptail")
    ck = str(tmp_path / "sptail_ck")
    sink = str(tmp_path / "sptail_sink")

    def batch(a, b):
        return spark.range(a, b).select(
            F.col("id"), (F.col("id") % 3).alias("p"),
            (F.col("id") * 1.0).alias("v"),
        )

    append_snapshot(Frame(batch(0, 50), ()), d, batch_id=0, partition_by="p")
    schema = "id bigint, v double, p bigint"
    s = stream_append_log(spark, d, schema)
    assert s.columns == ["id", "v", "p"]
    q = (
        s.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 50
    # restart after more appends: exactly-once, typed partition values
    append_snapshot(Frame(batch(50, 100), ()), d, batch_id=1)
    q2 = (
        stream_append_log(spark, d, schema)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == 100
    assert got.agg(F.sum("id")).first()[0] == 4950
    assert dict(got.dtypes)["p"] == "bigint"
    assert got.filter("p is null").count() == 0
    with pytest.raises(ValueError, match="partition"):
        stream_append_log(spark, d, "id bigint, v double")


# -- ADVICE fixes ------------------------------------------------------------


def test_pdir_string_forms(spark, tmp_path):
    # booleans render lowercase like the partition directories do
    # (r13: normalized form is (eq-set, range-conds))
    assert _normalize_pfilter({"b": True}) == {"b": ({"true"}, [])}
    assert _normalize_pfilter({"b": [False, None]}) == {
        "b": ({"false", None}, [])
    }
    import datetime

    assert _normalize_pfilter(
        {"t": datetime.datetime(2024, 1, 7, 12, 30)}
    ) == {"t": ({"2024-01-07 12:30:00"}, [])}
    assert _normalize_pfilter({"d": datetime.date(2024, 1, 7)}) == {
        "d": ({"2024-01-07"}, [])
    }
    with pytest.raises(ValueError, match="directory string"):
        _normalize_pfilter({"x": 1.5})
    # end-to-end: boolean partition values round-trip
    d = str(tmp_path / "pbool")
    df = spark.range(20).select(F.col("id"), (F.col("id") % 2 == 0).alias("b"))
    append_snapshot(Frame(df, ()), d, batch_id=0, partition_by="b")
    got = read_append_snapshot(spark, d, partition_filter={"b": True}).df
    assert got.count() == 10
    v, n = delete_append_rows(spark, d, partition_filter={"b": False})
    assert n == 10
    assert read_append_snapshot(spark, d).df.count() == 10


def test_upsert_on_stat_ineligible_key(spark, tmp_path):
    d = str(tmp_path / "updec")
    df = spark.range(10).select(
        F.col("id").cast("decimal(10,2)").alias("k"),
        (F.col("id") * 1.0).alias("v"),
    )
    append_snapshot(Frame(df, ()), d, batch_id=0)
    batch = spark.range(5, 12).select(
        F.col("id").cast("decimal(10,2)").alias("k"), F.lit(0.0).alias("v")
    )
    v, rep, app = upsert_append_rows(Frame(batch, ()), d, key="k")
    assert (rep, app) == (5, 7)
    assert read_append_snapshot(spark, d).df.count() == 12


def test_separate_rows_convert_per_column(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "ints": ["1,2", "3,4"],
            "nums": ["1.5,2", "3,4e2"],
            "mixed": ["1,abc", "2,3"],
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = Frame(sdf, ()).separate_rows(
        "ints", "nums", "mixed", convert=True
    )
    types = dict(out.df.dtypes)
    assert types["ints"] == "bigint"
    assert types["nums"] == "double"
    assert types["mixed"] == "string"  # non-numeric element: untouched
    vals = sorted(
        (r["ints"], r["nums"], r["mixed"]) for r in out.df.collect()
    )
    assert vals == [(1, 1.5, "1"), (2, 2.0, "abc"), (3, 3.0, "2"), (4, 400.0, "3")]
    # 19+ digit integers promote to double instead of overflowing long
    big = spark.createDataFrame(
        pd.DataFrame({"x": ["1,12345678901234567890"]})
    )
    out2 = Frame(big, ()).separate_rows("x", convert=True)
    assert dict(out2.df.dtypes)["x"] == "double"


def test_gapfill_bucket_whitelist(spark):
    import datetime

    from cuplyr_spark.operators.events import time_bucket_gapfill

    df = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1), 1.0),
            (datetime.datetime(2024, 8, 1), 2.0),
        ],
        "ts timestamp, v double",
    )
    out = time_bucket_gapfill(
        Frame(df, ()), "ts", bucket="quarter", total=F.sum("v")
    ).df
    rows = sorted((r["bucket_start"], r["total"]) for r in out.collect())
    assert [r[0].month for r in rows] == [1, 4, 7]  # Q1, Q2 (gap), Q3
    assert [r[1] for r in rows] == [1.0, None, 2.0]
    with pytest.raises(ValueError, match="bucket"):
        time_bucket_gapfill(Frame(df, ()), "ts", bucket="fortnight")


# -- partition-column derivation (r12 cont.) ---------------------------------


def test_derive_pfilter_grammar():
    from cuplyr_spark.sources.connectors import _derive_pfilter

    schema = [
        ["id", "bigint"], ["p", "string"], ["k", "int"], ["b", "boolean"],
        ["d", "date"],
    ]
    f = lambda s, pby: _derive_pfilter(s, pby, schema)  # noqa: E731
    assert f("p == '1' and id > 5", ["p"]) == {"p": ["1"]}
    assert f("p in ['a', 'b']", ["p"]) == {"p": ["a", "b"]}
    assert f("k == 3 and p == 'x'", ["k", "p"]) == {"k": ["3"], "p": ["x"]}
    assert f("b == True", ["b"]) == {"b": ["true"]}
    assert f("d == '2024-06-01'", ["d"]) == {"d": ["2024-06-01"]}
    # soundness gates: value-space coercions must NOT derive —
    # string_col == 1 matches '01' in Spark but '1' != '01' in dirs
    assert f("p == 1", ["p"]) is None
    assert f("k == '3'", ["k"]) is None
    # r13: same-column equality ORs derive an implied IN
    assert f("p == '1' or p == '2'", ["p"]) == {"p": ["1", "2"]}
    # r13: string/date partition ranges derive (order-preserving
    # rendering); r14: int partition ranges derive TYPED — the raw
    # int rides through and directory values parse back before
    # ordering ('9' > '10' is exactly why string-space refused)
    assert f("p > '1'", ["p"]) == {"p": [(">", "1")]}
    assert f("k > 3", ["k"]) == {"k": [(">", 3)]}
    assert f("k > 3.5", ["k"]) is None  # non-int bound: underivable
    assert f("id == 5", ["p"]) is None  # not a partition column
    assert f("p == '1'", []) is None


def test_string_predicate_prunes_partition_map(spark, tmp_path):
    d = str(tmp_path / "pder")
    lo = spark.range(100).select(
        F.col("id"), F.lit("a").alias("p"), (F.col("id") * 1.0).alias("v")
    )
    hi = spark.range(100, 200).select(
        F.col("id"), F.lit("b").alias("p"), (F.col("id") * 1.0).alias("v")
    )
    append_snapshot(Frame(lo, ()), d, batch_id=0, partition_by="p")
    append_snapshot(Frame(hi, ()), d, batch_id=1)
    seen = []
    orig = C._scan_with_dv
    try:
        C._scan_with_dv = (
            lambda spark, fs, log, segs, **kw: seen.append(list(segs))
            or orig(spark, fs, log, segs, **kw)
        )
        # zone maps can't see p (partition column, no stats recorded);
        # only the partition-map derivation can prune here — id ranges
        # overlap is irrelevant: the delete targets p == 'b' rows
        v, n = delete_append_rows(spark, d, "p == 'b' and id % 2 == 0")
    finally:
        C._scan_with_dv = orig
    assert n == 50
    assert len(seen) == 1 and len(seen[0]) == 1, seen
    got = read_append_snapshot(spark, d).df
    assert got.count() == 150
    # read path: where= derives the partition filter too
    sel = read_append_snapshot(spark, d, where="p == 'a' and id < 10").df
    assert sel.count() == 10


def test_read_append_changes_where(spark, tmp_path):
    from cuplyr_spark.sources.connectors import read_append_changes

    d = str(tmp_path / "chwhere")
    for i in range(3):
        df = spark.range(i * 100, i * 100 + 100).select(
            F.col("id"), (F.col("id") * 1.0).alias("v")
        )
        append_snapshot(Frame(df, ()), d, batch_id=i)
    got = read_append_changes(
        spark, d, since_version=1, where="id >= 250 and id % 2 == 0"
    ).df
    # window = versions 2..3 (rows 100..299); predicate keeps 250-298 even
    assert got.count() == 25
    assert got.agg(F.min("id")).first()[0] == 250
    # underivable predicate: exact results via full window scan
    got = read_append_changes(
        spark, d, since_version=0, where="id < 50 or id >= 290"
    ).df
    assert got.count() == 60
