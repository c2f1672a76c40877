"""Round-13 fixes and features.

ADVICE closures:
- HIGH: quote-aware ``=``→``==`` predicate rewrite — the old regex
  corrupted string literals containing ``=`` and the derived prune
  silently skipped matching segments (unsound).
- seg/fold-named partition columns: relative-path and segment
  extraction now anchor on exact directory names / fixed depth.
- restore vs concurrent vacuum TOCTOU: post-publish re-verify with
  loud roll-forward.
- stream_append_snapshot: unique_key plumbed through; inert
  on_conflict raises.

The reference has no storage layer (SURVEY.md §2.1); designs are
public art (Delta/Iceberg) rebuilt jar-free."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import cuplyr_spark.sources.connectors as C
from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    _derive_stats_filter,
    _rewrite_sql_eq,
    append_snapshot,
    delete_append_rows,
    read_append_snapshot,
    restore_append_snapshot,
)


# -- quote-aware '=' rewrite (ADVICE high) --------------------------------


def test_rewrite_sql_eq_masks_quoted_spans():
    assert _rewrite_sql_eq("status = 'a=b'") == "status == 'a=b'"
    assert _rewrite_sql_eq('status = "x=y"') == 'status == "x=y"'
    # escaped quote inside the literal does not end the span
    assert _rewrite_sql_eq(r"s = 'a\'= b'") == r"s == 'a\'= b'"
    # compound operators untouched; mixed quoted/unquoted
    assert (
        _rewrite_sql_eq("a <= 1 and b != 'p=q' and c = 2")
        == "a <= 1 and b != 'p=q' and c == 2"
    )
    assert _rewrite_sql_eq("a == 'x='") == "a == 'x='"


def test_derive_stats_filter_quoted_eq_literal():
    schema = [["status", "string"], ["x", "bigint"]]
    got = _derive_stats_filter("status = 'a=b' and x = 3", schema)
    assert got == {"status": [("==", "a=b")], "x": [("==", 3)]}


def test_quoted_eq_predicate_reads_and_deletes_matching_rows(spark, tmp_path):
    """End-to-end repro of the unsound prune: a predicate whose string
    literal contains '=' must still read/delete the rows in the
    segment holding them (the corrupted rewrite pruned it away)."""
    d = str(tmp_path / "eqlit")
    df1 = spark.createDataFrame(
        [(1, "a=b"), (2, "a=b"), (3, "plain")], "id long, status string"
    )
    df2 = spark.createDataFrame([(4, "zz")], "id long, status string")
    append_snapshot(Frame(df1, ()), d, batch_id=0)
    append_snapshot(Frame(df2, ()), d, batch_id=1)

    got = read_append_snapshot(spark, d, where="status = 'a=b'").collect()
    assert sorted(got["id"].tolist()) == [1, 2]

    _, deleted = delete_append_rows(spark, d, "status = 'a=b'")
    assert deleted == 2
    left = read_append_snapshot(spark, d).collect()
    assert sorted(left["id"].tolist()) == [3, 4]


# -- partition column literally named 'seg' / 'fold' ----------------------


def test_partition_column_named_seg_clustered_read(spark, tmp_path):
    """file_stats keys and DV addresses must survive partition dirs
    that look like segment dirs (seg=3-ab/seg=5/part.parquet)."""
    d = str(tmp_path / "segcol")
    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 4).alias("seg"),
        (F.col("id") % 3).alias("fold"),
        (F.col("id") * 1.5).alias("v"),
    )
    append_snapshot(
        Frame(df, ()), d, batch_id=0,
        partition_by=["seg", "fold"], cluster_by="id", cluster_files=4,
    )
    # file-grain pruning path: stats_filter on the cluster column
    got = read_append_snapshot(spark, d, stats_filter={"id": (">", 190)})
    out = got.collect()
    assert sorted(out["id"].tolist()) == list(range(191, 200))

    # DV path: delete rows, re-read — addresses must not mis-key
    _, n = delete_append_rows(spark, d, {"id": ("<", 10)})
    assert n == 10
    left = read_append_snapshot(spark, d).collect()
    assert len(left) == 190 and left["id"].min() == 10


def test_partition_column_named_seg_update_roundtrip(spark, tmp_path):
    from cuplyr_spark.sources.connectors import update_append_rows

    d = str(tmp_path / "segcol2")
    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 2).alias("seg"), F.lit(1.0).alias("v")
    )
    append_snapshot(Frame(df, ()), d, batch_id=0, partition_by="seg")
    update_append_rows(spark, d, "id < 5", {"v": "v + 10"})
    got = read_append_snapshot(spark, d).collect().sort_values("id")
    assert got["v"].head(5).tolist() == [11.0] * 5
    assert got["v"].tail(45).eq(1.0).all()


# -- restore/vacuum TOCTOU -------------------------------------------------


def test_restore_vacuum_race_rolls_forward(spark, tmp_path, monkeypatch):
    """Paths swept between the pre-publish check and the publish: the
    restore must detect it post-commit, roll the head forward to the
    pre-restore content, and raise — never leave a head whose reads
    die."""
    import shutil

    from cuplyr_spark.sources.connectors import compact_append_snapshot

    d = str(tmp_path / "race")
    for i in range(2):
        df = spark.createDataFrame([(i, f"v{i}")], "id long, v string")
        append_snapshot(Frame(df, ()), d, batch_id=i)
    # version 3 (head) references only the fold; versions 1-2 reference
    # the raw segments — exactly the restore-past-compaction shape
    compact_append_snapshot(spark, d, 1 << 30)
    fs = C._TableFS(d)
    target_segs = C._read_log(fs, 1)["segments"]
    head = C._read_log(fs, 3)
    victim = [s for s in target_segs if s not in head["segments"]][0]

    real_write_log = C._write_log

    def racing_write_log(fs, log, prev=None):
        # simulate a vacuum sweeping the target's segment AFTER the
        # existence pre-check but BEFORE the publish — then let the
        # publish proceed
        if log.get("restored_from") == 1 and os.path.isdir(
            os.path.join(d, victim)
        ):
            shutil.rmtree(os.path.join(d, victim))
        return real_write_log(fs, log, prev=prev)

    monkeypatch.setattr(C, "_write_log", racing_write_log)
    with pytest.raises(FileNotFoundError, match="rolled forward"):
        restore_append_snapshot(spark, d, 1)
    monkeypatch.undo()

    # head is the roll-forward: same live content as pre-restore
    got = read_append_snapshot(spark, d).collect()
    assert sorted(got["id"].tolist()) == [0, 1]
    final = C._read_log(C._TableFS(d))
    assert final["restored_from"] == head["version"]
    assert all(os.path.isdir(os.path.join(d, s)) for s in final["segments"])


# -- stream_append_snapshot unique_key plumbing ---------------------------


def test_stream_on_conflict_without_key_raises(spark, tmp_path):
    from cuplyr_spark.streaming.stream import stream_append_snapshot

    src = str(tmp_path / "src0")
    os.makedirs(src)
    stream = spark.readStream.schema("k long, v string").parquet(src)
    with pytest.raises(ValueError, match="unique_key"):
        stream_append_snapshot(
            stream, str(tmp_path / "t0"), checkpoint=str(tmp_path / "c0"),
            on_conflict="drop",
        )


def test_stream_unique_key_creates_constrained_table(spark, tmp_path):
    import pandas as pd

    from cuplyr_spark.streaming.stream import stream_append_snapshot

    src = str(tmp_path / "src1")
    os.makedirs(src)
    table = str(tmp_path / "t1")
    ckpt = str(tmp_path / "c1")
    pd.DataFrame({"k": [1, 2, 2], "v": ["a", "b", "b2"]}).to_parquet(
        f"{src}/b0.parquet", index=False
    )
    pd.DataFrame({"k": [2, 3], "v": ["dup", "c"]}).to_parquet(
        f"{src}/b1.parquet", index=False
    )
    q = stream_append_snapshot(
        spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src),
        table, checkpoint=ckpt, unique_key="k", on_conflict="drop",
    )
    q.awaitTermination()
    got = read_append_snapshot(spark, table).collect().sort_values("k")
    # within-batch dup (k=2) and cross-batch dup (k=2 again) dropped
    assert got["k"].tolist() == [1, 2, 3]
    assert C._read_log(C._TableFS(table))["unique_key"] == ["k"]


# -- decimal columns in the stats stack ------------------------------------


def test_decimal_zone_maps_prune_and_stay_exact(spark, tmp_path):
    """decimal(p,s) bounds are recorded as exact unscaled ints; a
    where= read with a fractional decimal literal derives the prune —
    shown the zone-map-test way: the non-matching segment is
    physically deleted and the read still runs."""
    import shutil

    from decimal import Decimal

    d = str(tmp_path / "dec")
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") / 100).cast("decimal(10,2)").alias("price"),
    )
    append_snapshot(Frame(df.filter("id < 50"), ()), d, batch_id=0)
    append_snapshot(Frame(df.filter("id >= 50"), ()), d, batch_id=1)
    log = C._read_log(C._TableFS(d))
    lo_seg = log["segments"][0]
    # bounds recorded as unscaled ints (0.00..0.49 -> 0..49)
    assert log["stats"][lo_seg]["cols"]["price"][:2] == [0, 49]

    shutil.rmtree(os.path.join(d, lo_seg))  # would fail if scanned
    got = read_append_snapshot(spark, d, where="price > 0.80").collect()
    assert len(got) == 19 and str(got["price"].min()) == "0.81"

    # dict form with Decimal / int / exact string all derive
    got2 = read_append_snapshot(
        spark, d, stats_filter={"price": (">=", Decimal("0.90"))}
    ).collect()
    assert len(got2) == 10
    got3 = read_append_snapshot(
        spark, d, stats_filter={"price": (">=", "0.90")}
    ).collect()
    assert len(got3) == 10
    # floats are refused loudly (double-space vs exact-domain mismatch)
    with pytest.raises(ValueError, match="float"):
        read_append_snapshot(spark, d, stats_filter={"price": (">", 0.5)})


def test_decimal_delete_prunes_through_zone_maps(spark, tmp_path):
    import shutil

    d = str(tmp_path / "decdel")
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") / 4).cast("decimal(8,2)").alias("amt"),
    )
    append_snapshot(Frame(df.filter("id < 50"), ()), d, batch_id=0)
    append_snapshot(Frame(df.filter("id >= 50"), ()), d, batch_id=1)
    log = C._read_log(C._TableFS(d))
    lo_seg = log["segments"][0]
    shutil.rmtree(os.path.join(d, lo_seg))  # delete must never open it
    _, n = delete_append_rows(spark, d, "amt >= 20.25")
    assert n == 19
    # literal finer than the column scale: underivable -> full scan,
    # which now fails loudly on the missing dir (sound, not silent)
    assert C._derive_stats_filter(
        "amt > 1.005", [["amt", "decimal(8,2)"]]
    ) is None


def test_decimal_cluster_by_file_stats(spark, tmp_path):
    d = str(tmp_path / "deccl")
    df = spark.range(400).select(
        F.col("id"),
        (F.col("id") / 100).cast("decimal(10,2)").alias("price"),
    )
    append_snapshot(
        Frame(df, ()), d, batch_id=0, cluster_by="price", cluster_files=4
    )
    log = C._read_log(C._TableFS(d))
    seg = log["segments"][0]
    fst = log["file_stats"][seg]
    assert len(fst) == 4
    # per-file unscaled-int ranges are near-disjoint slices
    ranges = sorted(st["cols"]["price"][:2] for st in fst.values())
    assert ranges[0][0] == 0 and ranges[-1][1] == 399
    got = read_append_snapshot(
        spark, d, stats_filter={"price": (">", "3.50")}
    )
    assert got.df.count() == 49


def test_decimal_quick_stats_value_space(spark, tmp_path):
    from cuplyr_spark.sources.connectors import append_quick_stats

    d = str(tmp_path / "decqs")
    df = spark.range(10).select(
        (F.col("id") / 8).cast("decimal(6,3)").alias("x")
    )
    append_snapshot(Frame(df, ()), d, batch_id=0)
    st = append_quick_stats(spark, d)
    assert st["cols"]["x"]["min"] == "0.000"
    assert st["cols"]["x"]["max"] == "1.125"
    assert st["cols"]["x"]["exact"] is True


# -- type-widening schema evolution ----------------------------------------


def test_type_widening_reads_and_prunes(spark, tmp_path):
    d = str(tmp_path / "widen")
    df1 = spark.range(10).select(
        F.col("id").cast("int").alias("k"),
        F.col("id").cast("float").alias("v"),
    )
    append_snapshot(Frame(df1, ()), d, batch_id=0)
    df2 = spark.range(10, 20).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    append_snapshot(Frame(df2, ()), d, batch_id=1, schema_mode="merge")
    log = C._read_log(C._TableFS(d))
    assert log["schema"] == [["k", "bigint"], ["v", "double"]]
    got = read_append_snapshot(spark, d).collect()
    assert len(got) == 20 and int(got["k"].sum()) == 190
    # derived prune still sound across both eras
    got2 = read_append_snapshot(spark, d, where="k >= 15").collect()
    assert sorted(got2["k"].tolist()) == list(range(15, 20))


def test_type_widening_narrow_batch_upcasts(spark, tmp_path):
    d = str(tmp_path / "upcast")
    append_snapshot(
        Frame(spark.range(5).select(F.col("id").alias("k")), ()),
        d, batch_id=0,
    )
    # a smallint batch lands on the bigint table: cast up, no widening
    append_snapshot(
        Frame(
            spark.range(5, 8).select(
                F.col("id").cast("smallint").alias("k")
            ),
            (),
        ),
        d, batch_id=1, schema_mode="merge",
    )
    log = C._read_log(C._TableFS(d))
    assert log["schema"] == [["k", "bigint"]]
    assert len(read_append_snapshot(spark, d).collect()) == 8


def test_type_narrowing_and_incompatible_refused(spark, tmp_path):
    d = str(tmp_path / "narrow")
    append_snapshot(
        Frame(spark.range(5).select(F.col("id").alias("k")), ()),
        d, batch_id=0,
    )
    # strict mode refuses ANY drift
    with pytest.raises(ValueError, match="type mismatch"):
        append_snapshot(
            Frame(
                spark.range(3).select(F.col("id").cast("int").alias("k")),
                (),
            ),
            d, batch_id=1,
        )
    # merge mode still refuses string<->number
    with pytest.raises(ValueError, match="type mismatch"):
        append_snapshot(
            Frame(
                spark.range(3).select(
                    F.col("id").cast("string").alias("k")
                ),
                (),
            ),
            d, batch_id=1, schema_mode="merge",
        )


def test_cdf_window_spans_widening(spark, tmp_path):
    from cuplyr_spark.sources.connectors import read_append_cdf

    d = str(tmp_path / "wcdf")
    append_snapshot(
        Frame(spark.range(4).select(F.col("id").cast("int").alias("k")), ()),
        d, batch_id=0,
    )
    append_snapshot(
        Frame(spark.range(4, 9).select(F.col("id").alias("k")), ()),
        d, batch_id=1, schema_mode="merge",
    )
    cdf = read_append_cdf(spark, d, since_version=0).collect()
    assert sorted(cdf["k"].tolist()) == list(range(9))
    assert set(cdf["_change_type"]) == {"insert"}


# -- CDF insert batching for partitioned tables -----------------------------


def test_cdf_batches_partitioned_insert_versions(spark, tmp_path):
    """r12 scoped insert batching to unpartitioned tables; the
    basePath-rooted discovery extends it — one relation for a 3-insert
    partitioned window, partition values/types intact."""
    from cuplyr_spark.sources.connectors import read_append_cdf

    d = str(tmp_path / "cdfp")
    for i in range(3):
        df = spark.range(i * 10, i * 10 + 10).select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("p"),
            (F.col("id") * 1.0).alias("v"),
        )
        append_snapshot(Frame(df, ()), d, batch_id=i, partition_by="p")
    cdf = read_append_cdf(spark, d, since_version=0).df
    plan = cdf._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # one relation, 3 versions
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
    assert dict(cdf.dtypes)["p"] == "string"


def test_cdf_partitioned_seg_named_column_falls_back(spark, tmp_path):
    """A partition column literally named 'seg' cannot batch (it would
    collide with the segment discovery level) — the per-version path
    still emits every insert exactly once."""
    from cuplyr_spark.sources.connectors import read_append_cdf

    d = str(tmp_path / "cdfs")
    for i in range(3):
        df = spark.range(i * 4, i * 4 + 4).select(
            F.col("id"), (F.col("id") % 2).alias("seg")
        )
        append_snapshot(Frame(df, ()), d, batch_id=i, partition_by="seg")
    cdf = read_append_cdf(spark, d, since_version=0).df.toPandas()
    assert len(cdf) == 12
    assert sorted(cdf["_commit_version"].unique().tolist()) == [1, 2, 3]


# -- conditional-put commit hook --------------------------------------------


def test_conditional_put_hook_arbitrates_commit_race(spark, tmp_path):
    """Object stores with atomic create-if-absent (If-None-Match PUTs)
    register a conditional-put backend per scheme; the commit primitive
    then routes through it instead of the Hadoop rename (whose S3A
    variant is not atomic). Exercised with a fake store backend on a
    file:// table: two writers race one version, the store arbitrates,
    the loser rebases — no silent clobber, no duplicate."""
    import os as _os
    from urllib.parse import urlparse

    calls = {"n": 0}
    d = "file://" + str(tmp_path / "t")

    def backend(url, text):
        path = urlparse(url).path
        if calls["n"] == 0 and "/_LOG.2" in path:
            calls["n"] += 1
            # a competitor lands version 2 first, through the same
            # conditional-put arbitration
            append_snapshot(
                Frame(
                    spark.createDataFrame([(7, "theirs")],
                                          "id long, v string"),
                    (),
                ),
                d, batch_id=7, app_id="competitor",
            )
        try:
            fd = _os.open(path, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
        except FileExistsError:
            return False
        with _os.fdopen(fd, "w") as f:
            f.write(text)
        return True

    C.register_exclusive_put("file", backend)
    try:
        append_snapshot(
            Frame(
                spark.createDataFrame([(1, "a")], "id long, v string"), ()
            ),
            d, batch_id=0,
        )
        append_snapshot(
            Frame(
                spark.createDataFrame([(2, "ours")], "id long, v string"),
                (),
            ),
            d, batch_id=1,
        )
    finally:
        C.register_exclusive_put("file", None)
    got = read_append_snapshot(spark, d).collect()
    assert sorted(got["id"].tolist()) == [1, 2, 7]
    head = C._read_log(C._TableFS(d, spark))
    assert head["version"] == 3  # loser rebased past the competitor
    assert calls["n"] == 1


def test_http_if_none_match_put_contract():
    """The reference HTTP backend translates 412 to the CAS-loser
    False and re-raises anything else."""
    import io
    import urllib.error
    from unittest import mock

    from cuplyr_spark.sources.connectors import http_if_none_match_put

    with mock.patch("urllib.request.urlopen") as m:
        m.return_value.__enter__ = lambda s: s
        m.return_value.__exit__ = lambda s, *a: False
        assert http_if_none_match_put("http://x/y", "t") is True
        req = m.call_args[0][0]
        assert req.get_method() == "PUT"
        assert req.get_header("If-none-match") == "*"

    err412 = urllib.error.HTTPError(
        "http://x/y", 412, "Precondition Failed", {}, io.BytesIO(b"")
    )
    with mock.patch("urllib.request.urlopen", side_effect=err412):
        assert http_if_none_match_put("http://x/y", "t") is False
    err500 = urllib.error.HTTPError(
        "http://x/y", 500, "boom", {}, io.BytesIO(b"")
    )
    with mock.patch("urllib.request.urlopen", side_effect=err500):
        with pytest.raises(urllib.error.HTTPError):
            http_if_none_match_put("http://x/y", "t")


# -- range predicates on partition columns -----------------------------------


def test_partition_range_prunes_segments_and_dirs(spark, tmp_path):
    import shutil

    d = str(tmp_path / "prange")
    df = spark.range(90).select(
        F.col("id"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), F.col("id").cast("int")
        ).alias("day"),
    )
    append_snapshot(Frame(df.filter("id < 30"), ()), d, batch_id=0,
                    partition_by="day")
    append_snapshot(Frame(df.filter("id >= 30 and id < 60"), ()), d,
                    batch_id=1)
    append_snapshot(Frame(df.filter("id >= 60"), ()), d, batch_id=2)
    log = C._read_log(C._TableFS(d))
    # derivation: range conjuncts on a date partition column compile
    got = C._derive_pfilter(
        "day >= '2024-03-01' and day < '2024-03-15'", ["day"],
        log["schema"],
    )
    assert got == {"day": [(">=", "2024-03-01"), ("<", "2024-03-15")]}
    # spy: early segments physically gone; the range read never opens
    for s in log["segments"][:2]:
        shutil.rmtree(os.path.join(d, s))
    out = read_append_snapshot(
        spark, d, where="day >= '2024-03-05'"
    ).collect()
    assert len(out) == 26 and str(out["day"].min()) == "2024-03-05"
    # dict cond form with both bounds
    out2 = read_append_snapshot(
        spark, d,
        partition_filter={"day": [(">", "2024-03-10"), ("<=", "2024-03-20")]},
    ).collect()
    assert len(out2) == 10
    # partition-scoped row-level delete through a range
    _, n = delete_append_rows(
        spark, d, partition_filter={"day": (">=", "2024-03-25")}
    )
    assert n == 6


def test_partition_range_int_columns_compare_typed(spark, tmp_path):
    """Int partition dirs don't order lexicographically ('9' > '10') —
    round 14 lifts the r13 refusal by comparing TYPED: directory
    values parse back to exact ints before ordering. Spy-level
    pruning assertions live in test_round14.py."""
    d = str(tmp_path / "pint")
    df = spark.range(20).select(F.col("id"), (F.col("id") % 12).alias("p"))
    append_snapshot(Frame(df, ()), d, batch_id=0, partition_by="p")
    got = read_append_snapshot(
        spark, d, partition_filter={"p": (">", 3)}
    ).collect()
    assert len(got) == 12
    log = C._read_log(C._TableFS(d))
    assert C._derive_pfilter("p > 3", ["p"], log["schema"]) == {
        "p": [(">", 3)]
    }
    got = read_append_snapshot(spark, d, where="p > 3").collect()
    assert len(got) == 12


# -- timestamp time travel and vacuum dry-run --------------------------------


def test_as_of_timestamp_resolution(spark, tmp_path):
    import time

    from cuplyr_spark.sources.connectors import (
        append_history,
        append_version_as_of,
    )

    d = str(tmp_path / "asof")
    marks = []
    for i in range(4):
        append_snapshot(
            Frame(spark.createDataFrame([(i,)], "id long"), ()),
            d, batch_id=i,
        )
        marks.append(time.time())
        time.sleep(0.05)
    assert append_version_as_of(d, marks[1]) == 2
    got = read_append_snapshot(spark, d, as_of=marks[2]).collect()
    assert sorted(got["id"].tolist()) == [0, 1, 2]
    hist = append_history(d, spark)
    ts = [h["ts"] for h in hist]
    assert all(t is not None for t in ts) and ts == sorted(ts)
    with pytest.raises(ValueError, match="oldest retained"):
        append_version_as_of(d, marks[0] - 1000)
    with pytest.raises(ValueError, match="not both"):
        read_append_snapshot(spark, d, version=1, as_of=marks[0])


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    from cuplyr_spark.sources.connectors import (
        compact_append_snapshot,
        vacuum_append_snapshot,
    )

    d = str(tmp_path / "vdry")
    for i in range(4):
        append_snapshot(
            Frame(spark.createDataFrame([(i,)], "id long"), ()),
            d, batch_id=i,
        )
    compact_append_snapshot(spark, d, 1 << 30)  # v5: fold, segs orphan
    report = vacuum_append_snapshot(
        d, keep_last=1, spark=spark, dry_run=True
    )
    assert len(report["segments"]) == 4  # raw segs only the old logs hold
    assert report["log_versions"] == [1, 2, 3, 4]
    assert report["keep_versions"] == [5]
    # nothing was deleted
    assert all(os.path.isdir(os.path.join(d, s)) for s in report["segments"])
    assert all(
        os.path.exists(os.path.join(d, f"_LOG.{v}"))
        for v in report["log_versions"]
    )
    # the real pass deletes exactly the reported set
    deleted = vacuum_append_snapshot(d, keep_last=1, spark=spark)
    assert deleted == report["segments"]
    assert len(read_append_snapshot(spark, d).collect()) == 4


def test_upsert_type_widening(spark, tmp_path):
    from cuplyr_spark.sources.connectors import upsert_append_rows

    d = str(tmp_path / "wup")
    df1 = spark.range(10).select(
        F.col("id").cast("int").alias("k"), F.lit(1.0).alias("v")
    )
    append_snapshot(Frame(df1, ()), d, batch_id=0)
    up = spark.range(5, 13).select(
        F.col("id").alias("k"), F.lit(9.0).alias("v")
    )
    _, nr, na = upsert_append_rows(
        Frame(up, ()), d, "k", schema_mode="merge"
    )
    assert (nr, na) == (5, 8)
    log = C._read_log(C._TableFS(d))
    assert log["schema"] == [["k", "bigint"], ["v", "double"]]
    got = read_append_snapshot(spark, d).collect().sort_values("k")
    assert len(got) == 13 and got["v"].tail(8).eq(9.0).all()
    # merge mode still refuses incompatible changes
    bad = spark.range(2).select(
        F.col("id").cast("string").alias("k"), F.lit(0.0).alias("v")
    )
    with pytest.raises(ValueError, match="type mismatch"):
        upsert_append_rows(Frame(bad, ()), d, "k", schema_mode="merge")


def test_decimal_precision_widening(spark, tmp_path):
    """Same-scale decimal precision growth is exact (unchanged
    unscaled-int stats domain; the reader upcasts natively): append
    and upsert widen the manifest, scale changes still refuse."""
    from decimal import Decimal

    from cuplyr_spark.sources.connectors import upsert_append_rows

    d = str(tmp_path / "dprec")
    df1 = spark.range(6).select(
        F.col("id").alias("k"),
        (F.col("id") / 4).cast("decimal(8,2)").alias("amt"),
    )
    append_snapshot(Frame(df1, ()), d, batch_id=0)
    # narrower-precision batch upcasts on upsert
    up = spark.range(4, 8).select(
        F.col("id").alias("k"), F.lit(Decimal("9.50")).alias("amt")
    )
    upsert_append_rows(Frame(up, ()), d, "k", schema_mode="merge")
    assert C._read_log(C._TableFS(d))["schema"][1] == ["amt", "decimal(8,2)"]
    # wider-precision batch widens the manifest
    big = spark.range(8, 10).select(
        F.col("id").alias("k"),
        F.lit(Decimal("123456789.25")).cast("decimal(12,2)").alias("amt"),
    )
    append_snapshot(Frame(big, ()), d, batch_id=1, schema_mode="merge")
    assert C._read_log(C._TableFS(d))["schema"][1] == [
        "amt", "decimal(12,2)"
    ]
    got = read_append_snapshot(spark, d, where="amt >= 9.50").collect()
    assert len(got) == 6  # 4 upserted 9.50s + 2 wide rows
    # scale change refuses
    bad = spark.range(2).select(
        F.col("id").alias("k"),
        F.lit(Decimal("1.555")).cast("decimal(12,3)").alias("amt"),
    )
    with pytest.raises(ValueError, match="type mismatch"):
        append_snapshot(Frame(bad, ()), d, batch_id=2, schema_mode="merge")


# -- OR-of-equalities derivation ---------------------------------------------


def test_or_equality_derivation(spark, tmp_path):
    """Same-column equality disjunctions compile to an implied IN —
    the `k == 1 or k == 3` shape that previously derived nothing;
    mixed-column or non-equality ORs still degrade to the full scan
    (sound)."""
    import shutil

    schema = [["k", "bigint"], ["p", "string"], ["v", "double"]]
    assert _derive_stats_filter("k == 1 or k == 3", schema) == {
        "k": [("in", [1, 3])]
    }
    assert _derive_stats_filter(
        "(k == 1 or k in [3, 5]) and v > 2", schema
    ) == {"k": [("in", [1, 3, 5])], "v": [(">", 2)]}
    assert _derive_stats_filter("k == 1 or v == 3", schema) is None
    assert _derive_stats_filter("k == 1 or v > 3", schema) is None
    assert C._derive_pfilter("p == 'a' or p == 'c'", ["p"], schema) == {
        "p": ["a", "c"]
    }
    assert C._derive_pfilter("p == 'a' or k == 1", ["p"], schema) is None

    d = str(tmp_path / "oreq")
    df = spark.range(100).select(F.col("id"), (F.col("id") * 1.0).alias("v"))
    append_snapshot(Frame(df.filter("id < 50"), ()), d, batch_id=0)
    append_snapshot(Frame(df.filter("id >= 50"), ()), d, batch_id=1)
    log = C._read_log(C._TableFS(d))
    shutil.rmtree(os.path.join(d, log["segments"][0]))  # spy
    got = read_append_snapshot(spark, d, where="id == 60 or id == 70")
    assert sorted(got.collect()["id"].tolist()) == [60, 70]
    _, n = delete_append_rows(spark, d, "id == 55 or id in [65, 75]")
    assert n == 3
