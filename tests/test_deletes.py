"""Deletion vectors (merge-on-read row-level DELETE/UPDATE) on append
tables: `connectors.delete_append_rows` / `update_append_rows` and
their interactions with reads, time travel, the change feed,
compaction, vacuum, sketch-sidecar statistics, and concurrent writers.

The reference has no storage layer at all (SURVEY.md §2.1); this is
the Delta/Iceberg deletion-vector design re-expressed jar-free: row
addresses are (segment, file-within-segment, parquet row position from
the scan's `_metadata.row_index`), written as tiny `_delete/dv=*`
parquets and applied by readers as a broadcast anti-join over ONLY the
delete-carrying segments."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    ConcurrentWriteError,
    append_history,
    append_snapshot,
    compact_append_snapshot,
    delete_append_rows,
    read_append_changes,
    read_append_snapshot,
    table_stats,
    update_append_rows,
    vacuum_append_snapshot,
)


def _mk(spark, tmp_path, name, two_batches=True, **kw):
    d = str(tmp_path / name)
    shutil.rmtree(d, ignore_errors=True)
    df = spark.range(100).select(
        F.col("id").cast("long"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    if two_batches:
        append_snapshot(Frame(df.filter("id < 50"), ()), d, batch_id=0, **kw)
        append_snapshot(Frame(df.filter("id >= 50"), ()), d, batch_id=1, **kw)
    else:
        append_snapshot(Frame(df, ()), d, batch_id=0, **kw)
    return d


def _log(d, v):
    # manifests are delta records since the checkpointing rework:
    # materialize through the reader
    from cuplyr_spark.sources.connectors import _read_log, _TableFS

    return _read_log(_TableFS(d), v)


def test_delete_basic_and_time_travel(spark, tmp_path):
    d = _mk(spark, tmp_path, "t1")
    v, n = delete_append_rows(spark, d, {"id": [(">=", 10), ("<", 20)]})
    assert (v, n) == (3, 10)
    got = sorted(r["id"] for r in read_append_snapshot(spark, d).df.collect())
    assert got == [i for i in range(100) if not (10 <= i < 20)]
    # the data files are untouched: pre-delete version still complete
    assert read_append_snapshot(spark, d, version=2).df.count() == 100


def test_delete_string_predicate_and_no_rewrite_of_marked_rows(spark, tmp_path):
    d = _mk(spark, tmp_path, "t2")
    delete_append_rows(spark, d, {"id": [(">=", 10), ("<", 20)]})
    # overlapping second delete scans THROUGH the first DV: only the
    # 5 still-live rows in [15, 25) are marked, so counts stay additive
    v, n = delete_append_rows(spark, d, "id >= 15 and id < 25")
    assert n == 5
    assert read_append_snapshot(spark, d).df.count() == 85
    cmap = _log(d, v)["delete_counts"]
    assert sum(cmap.values()) == 15


def test_delete_no_match_publishes_nothing(spark, tmp_path):
    d = _mk(spark, tmp_path, "t3")
    v0, _ = delete_append_rows(spark, d, {"id": ("<", 5)})
    v, n = delete_append_rows(spark, d, "id = 2")  # already deleted
    assert n == 0 and v == v0
    # and no stray DV dir for the no-op
    dvs = os.listdir(os.path.join(d, "_delete"))
    assert len(dvs) == 1


def test_delete_dict_form_prunes_segments(spark, tmp_path):
    """The dict (stats_filter) form never scans segments whose zone
    maps prove no match — shown the zone-map-test way: physically
    delete the non-candidate segment's directory and the delete still
    runs."""
    d = str(tmp_path / "t4")
    lo = spark.range(0, 50).select(F.col("id").cast("long"))
    hi = spark.range(1000, 1050).select(F.col("id").cast("long"))
    append_snapshot(Frame(lo, ()), d, batch_id=0)
    append_snapshot(Frame(hi, ()), d, batch_id=1)
    log = _log(d, 2)
    lo_seg = log["segments"][0]
    shutil.rmtree(os.path.join(d, lo_seg))  # would fail if scanned
    v, n = delete_append_rows(spark, d, {"id": (">=", 1040)})
    assert n == 10
    # DV addresses point only at the hi segment
    dmap = _log(d, v)["deletes"]
    assert list(dmap) == [log["segments"][1]]


def test_append_after_delete_keeps_dvs(spark, tmp_path):
    d = _mk(spark, tmp_path, "t5")
    delete_append_rows(spark, d, {"id": ("<", 10)})
    extra = spark.range(100, 110).select(
        F.col("id").cast("long"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    append_snapshot(Frame(extra, ()), d, batch_id=2)
    got = sorted(r["id"] for r in read_append_snapshot(spark, d).df.collect())
    assert got == list(range(10, 110))


def test_update_rows(spark, tmp_path):
    d = _mk(spark, tmp_path, "t6")
    v, n = update_append_rows(spark, d, "id >= 95", {"v": "v + 1000"})
    assert n == 5
    rows = {r["id"]: r["v"] for r in read_append_snapshot(spark, d).df.collect()}
    assert len(rows) == 100
    assert rows[95] == 95 * 2 + 1000 and rows[94] == 94 * 2
    # updated copies are APPENDED rows in the change feed (delete+insert)
    ch = read_append_changes(spark, d, since_version=2)
    assert sorted(r["id"] for r in ch.df.collect()) == [95, 96, 97, 98, 99]


def test_update_refuses_new_columns(spark, tmp_path):
    d = _mk(spark, tmp_path, "t7", two_batches=False)
    with pytest.raises(ValueError, match="fixed-schema"):
        update_append_rows(spark, d, "id < 5", {"brand_new": "id + 1"})


def test_cdf_deletes_default_and_applied(spark, tmp_path):
    d = _mk(spark, tmp_path, "t8")
    delete_append_rows(spark, d, {"id": ("<", 30)})
    # default: rows AS APPENDED — the delete does not rewrite history
    assert read_append_changes(spark, d, since_version=0).df.count() == 100
    # apply_deletes: only rows still live at the end version
    assert (
        read_append_changes(
            spark, d, since_version=0, apply_deletes=True
        ).df.count()
        == 70
    )


def test_compact_materializes_deletes(spark, tmp_path):
    d = _mk(spark, tmp_path, "t9")
    delete_append_rows(spark, d, {"id": [(">=", 0), ("<", 25)]})
    cv = compact_append_snapshot(
        spark, d, target_file_bytes=1 << 30, purge_deletes=True
    )
    assert cv is not None
    log = _log(d, cv)
    assert not log.get("deletes") and not log.get("delete_counts")
    assert read_append_snapshot(spark, d).df.count() == 75
    # recomputed zone maps are tight: min reflects the deletions
    (fold_seg,) = log["segments"]
    assert int(log["stats"][fold_seg]["cols"]["id"][0]) == 25


def test_compact_keeps_dvs_of_untouched_segments(spark, tmp_path):
    """A fold that doesn't include a delete-carrying right-sized
    segment must CARRY that segment's DVs into the new log."""
    d = str(tmp_path / "t10")
    big = spark.range(0, 20000).select(F.col("id").cast("long")).coalesce(1)
    small = spark.range(20000, 20010).select(F.col("id").cast("long"))
    append_snapshot(Frame(big, ()), d, batch_id=0)
    v, n = delete_append_rows(spark, d, {"id": ("<", 100)})
    assert n == 100
    append_snapshot(Frame(small, ()), d, batch_id=1)
    append_snapshot(
        Frame(small.select((F.col("id") + 10).alias("id")), ()), d, batch_id=2
    )
    # target sized so the big (delete-carrying) segment is right-sized
    # and only the two tiny appends fold
    big_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fn in os.walk(os.path.join(d, _log(d, 1)["segments"][0]))
        for f in fn
        if not f.startswith(("_", "."))  # the planner's data-file rule
    )
    cv = compact_append_snapshot(spark, d, target_file_bytes=big_bytes)
    assert cv is not None
    log = _log(d, cv)
    assert any(s.startswith("fold=") for s in log["segments"])
    assert log["deletes"]  # the big segment's DV survived
    assert read_append_snapshot(spark, d).df.count() == 20000 - 100 + 20


def test_vacuum_sweeps_unreferenced_dvs(spark, tmp_path):
    d = _mk(spark, tmp_path, "t11")
    delete_append_rows(spark, d, {"id": ("<", 10)})
    compact_append_snapshot(
        spark, d, target_file_bytes=1 << 30, purge_deletes=True
    )
    assert os.listdir(os.path.join(d, "_delete"))
    vacuum_append_snapshot(d, keep_last=1, orphan_grace_hours=0)
    assert not os.listdir(os.path.join(d, "_delete"))
    assert read_append_snapshot(spark, d).df.count() == 90


def test_vacuum_keeps_referenced_dvs(spark, tmp_path):
    d = _mk(spark, tmp_path, "t12")
    delete_append_rows(spark, d, {"id": ("<", 10)})
    vacuum_append_snapshot(d, keep_last=1, orphan_grace_hours=0)
    assert os.listdir(os.path.join(d, "_delete"))  # published log needs it
    assert read_append_snapshot(spark, d).df.count() == 90


def test_table_stats_subtracts_deletes(spark, tmp_path):
    d = _mk(
        spark,
        tmp_path,
        "t13",
        sketch_spec={"distinct": ["g"], "histogram": {}, "bloom": {}},
    )
    delete_append_rows(spark, d, {"id": [(">=", 40), ("<", 60)]})
    row = table_stats(spark, d).df.collect()[0]
    assert row["rows"] == 80  # EXACT under merge-on-read deletes
    # after purge-compaction the sidecar itself is re-sketched
    compact_append_snapshot(
        spark, d, target_file_bytes=1 << 30, purge_deletes=True
    )
    row = table_stats(spark, d).df.collect()[0]
    assert row["rows"] == 80


def test_partitioned_delete_update_and_filtered_read(spark, tmp_path):
    d = str(tmp_path / "t14")
    df = spark.range(100).select(
        F.col("id").cast("long"),
        (F.col("id") % 4).cast("string").alias("p"),
        (F.col("id") * 3).alias("v"),
    )
    append_snapshot(Frame(df, ()), d, batch_id=0, partition_by="p")
    v, n = delete_append_rows(spark, d, "p = '1' and id < 50")
    assert n == 13  # ids 1,5,...,49
    got = read_append_snapshot(spark, d, partition_filter={"p": "1"})
    assert sorted(r["id"] for r in got.df.collect()) == [
        i for i in range(50, 100) if i % 4 == 1
    ]
    assert read_append_snapshot(spark, d).df.count() == 87
    # update a partition column: rows MOVE partitions via the new segment
    v, n = update_append_rows(spark, d, "id = 96", {"p": "'relocated'"})
    assert n == 1
    moved = read_append_snapshot(
        spark, d, partition_filter={"p": "relocated"}
    ).df.collect()
    assert len(moved) == 1 and moved[0]["id"] == 96 and moved[0]["v"] == 288
    assert read_append_snapshot(spark, d).df.count() == 87


def test_delete_concurrent_append_rebases(spark, tmp_path, monkeypatch):
    """An append landing between the delete's scan and its log commit
    only ADDS a segment — the delete's row addresses stay valid, so the
    rebase publishes both."""
    import cuplyr_spark.sources.connectors as C

    d = _mk(spark, tmp_path, "t15")
    real = C._write_log
    fired = {}

    def racing(fs, log, prev=None):
        if "delete_counts" in log and not fired:
            fired["x"] = True
            extra = spark.range(100, 105).select(
                F.col("id").cast("long"),
                (F.col("id") % 10).alias("g"),
                (F.col("id") * 2).alias("v"),
            )
            append_snapshot(Frame(extra, ()), d, batch_id=7)
        return real(fs, log, prev=prev)

    monkeypatch.setattr(C, "_write_log", racing)
    v, n = delete_append_rows(spark, d, {"id": ("<", 10)})
    assert n == 10 and v == 4  # append took v3, delete rebased to v4
    assert read_append_snapshot(spark, d).df.count() == 95


def test_delete_concurrent_fold_raises(spark, tmp_path, monkeypatch):
    """A compaction folding a touched segment between scan and commit
    invalidates the row addresses — the delete must surface
    ConcurrentWriteError, never publish stale DVs."""
    import cuplyr_spark.sources.connectors as C

    d = _mk(spark, tmp_path, "t16")
    real = C._write_log
    fired = {}

    def racing(fs, log, prev=None):
        if "delete_counts" in log and not fired:
            fired["x"] = True
            compact_append_snapshot(spark, d, target_file_bytes=1 << 30)
        return real(fs, log, prev=prev)

    monkeypatch.setattr(C, "_write_log", racing)
    with pytest.raises(ConcurrentWriteError, match="compacted away"):
        delete_append_rows(spark, d, {"id": ("<", 10)})
    # and the table is untouched by the failed delete
    assert read_append_snapshot(spark, d).df.count() == 100


def test_fully_deleted_segment_never_opened(spark, tmp_path):
    """When a segment's exact delete count reaches its zone-map row
    count, reads skip it entirely — proven by removing its directory
    and its DV files from disk."""
    d = _mk(spark, tmp_path, "t18")
    log = _log(d, 2)
    first = log["segments"][0]  # ids 0..49
    v, n = delete_append_rows(spark, d, {"id": ("<", 50)})
    assert n == 50
    shutil.rmtree(os.path.join(d, first))
    got = sorted(r["id"] for r in read_append_snapshot(spark, d).df.collect())
    assert got == list(range(50, 100))


def test_history_reports_deleted_rows(spark, tmp_path):
    d = _mk(spark, tmp_path, "t17")
    delete_append_rows(spark, d, {"id": ("<", 10)})
    delete_append_rows(spark, d, {"id": (">=", 90)})
    hist = {h["version"]: h["rows_deleted"] for h in append_history(d)}
    assert hist[2] == 0 and hist[3] == 10 and hist[4] == 20


def test_upsert_append_rows(spark, tmp_path):
    """Keyed MERGE at merge-on-read cost: matched table rows DV-marked,
    the whole batch appended in the same log version."""
    from cuplyr_spark.sources.connectors import upsert_append_rows

    d = _mk(spark, tmp_path, "t19")
    batch = spark.createDataFrame(
        [(40, 99, -1), (41, 99, -2), (200, 99, -3)], "id long, g long, v long"
    )
    v, replaced, appended = upsert_append_rows(Frame(batch, ()), d, key="id")
    assert (replaced, appended) == (2, 3)
    rows = {r["id"]: (r["g"], r["v"]) for r in read_append_snapshot(spark, d).df.collect()}
    assert len(rows) == 101  # 100 - 2 replaced + 3 (2 updates, 1 insert)
    assert rows[40] == (99, -1) and rows[41] == (99, -2) and rows[200] == (99, -3)
    assert rows[42] == (2, 84)  # untouched


def test_upsert_append_rows_prunes_by_key(spark, tmp_path):
    """Single-key upserts prune candidate segments through the zone
    maps before any scan — proven the usual way: the non-candidate
    segment's directory is gone and the upsert still runs."""
    from cuplyr_spark.sources.connectors import upsert_append_rows

    d = str(tmp_path / "t20")
    append_snapshot(
        Frame(spark.range(0, 100).select(F.col("id").cast("long")), ()),
        d, batch_id=0,
    )
    append_snapshot(
        Frame(spark.range(5000, 5100).select(F.col("id").cast("long")), ()),
        d, batch_id=1,
    )
    lo_seg = _log(d, 2)["segments"][0]
    shutil.rmtree(os.path.join(d, lo_seg))
    batch = spark.createDataFrame([(5050,), (9999,)], "id long")
    v, replaced, appended = upsert_append_rows(Frame(batch, ()), d, key="id")
    assert (replaced, appended) == (1, 2)


def test_upsert_append_rows_validates_schema(spark, tmp_path):
    from cuplyr_spark.sources.connectors import upsert_append_rows

    d = _mk(spark, tmp_path, "t21", two_batches=False)
    bad = spark.createDataFrame([(1, 2)], "id long, extra long")
    with pytest.raises(ValueError, match="fixed-schema"):
        upsert_append_rows(Frame(bad, ()), d, key="id")
    with pytest.raises(ValueError, match="key columns"):
        upsert_append_rows(
            Frame(spark.createDataFrame(
                [(1, 1, 1)], "id long, g long, v long"), ()),
            d, key="nope",
        )


def test_delete_residual_composes_with_pruning(spark, tmp_path):
    """residual= refines WITHIN the zone-map-pruned candidate segments:
    dict scoping + free-form predicate, both required to match."""
    d = str(tmp_path / "t22")
    lo = spark.range(0, 50).select(F.col("id").cast("long"))
    hi = spark.range(1000, 1050).select(F.col("id").cast("long"))
    append_snapshot(Frame(lo, ()), d, batch_id=0)
    append_snapshot(Frame(hi, ()), d, batch_id=1)
    lo_seg = _log(d, 2)["segments"][0]
    shutil.rmtree(os.path.join(d, lo_seg))  # prune proof: never scanned
    v, n = delete_append_rows(
        spark, d, {"id": (">=", 1000)}, residual="id % 2 = 0"
    )
    assert n == 25
    # residual with a non-dict where is refused
    with pytest.raises(ValueError, match="residual"):
        delete_append_rows(spark, d, "id > 0", residual="id < 10")


def test_read_append_cdf_typed_feed(spark, tmp_path):
    """Typed CDF: inserts per append version, deletes for DV-added
    versions, and an UPDATE decomposed as delete+insert in one
    version. A mirror replaying the feed in order reproduces the
    table."""
    from cuplyr_spark.sources.connectors import read_append_cdf

    d = _mk(spark, tmp_path, "t23")  # v1: id<50, v2: id>=50
    delete_append_rows(spark, d, {"id": ("<", 10)})  # v3
    update_append_rows(spark, d, "id >= 95", {"v": "v + 1"})  # v4
    cdf = read_append_cdf(spark, d, since_version=0)
    rows = [
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in cdf.df.collect()
    ]
    by = {}
    for i, t, k in rows:
        by.setdefault((t, k), set()).add(i)
    assert by[("insert", 1)] == set(range(50))
    assert by[("insert", 2)] == set(range(50, 100))
    assert by[("delete", 3)] == set(range(10))
    assert by[("delete", 4)] == set(range(95, 100))
    assert by[("insert", 4)] == set(range(95, 100))
    # the update's insert carries the NEW value, its delete the OLD
    vals = {
        (r["_change_type"], r["id"]): r["v"]
        for r in cdf.df.filter("id = 95").collect()
    }
    assert vals[("delete", 95)] == 190 and vals[("insert", 95)] == 191
    # mirror replay: inserts minus later deletes == the live table
    import pandas as pd

    pdf = cdf.df.toPandas()
    state = {}
    for k in sorted(pdf["_commit_version"].unique()):
        win = pdf[pdf["_commit_version"] == k]
        for _, r in win[win["_change_type"] == "delete"].iterrows():
            state.pop(r["id"], None)
        for _, r in win[win["_change_type"] == "insert"].iterrows():
            state[r["id"]] = r["v"]
    live = {
        r["id"]: r["v"] for r in read_append_snapshot(spark, d).df.collect()
    }
    assert state == live
    # empty window: typed empty frame at the extended schema
    empty = read_append_cdf(spark, d, since_version=4)
    assert empty.df.count() == 0
    assert "_change_type" in empty.df.columns


def test_compact_shuffle_mode(spark, tmp_path):
    """shuffle=True folds via repartition (parallel write) and stays
    row-identical to the zero-shuffle coalesce fold."""
    d = _mk(spark, tmp_path, "t24")
    delete_append_rows(spark, d, {"id": ("<", 20)})
    cv = compact_append_snapshot(
        spark, d, target_file_bytes=1 << 30, purge_deletes=True,
        shuffle=True,
    )
    assert cv is not None
    got = sorted(r["id"] for r in read_append_snapshot(spark, d).df.collect())
    assert got == list(range(20, 100))
    assert not _log(d, cv).get("deletes")


def test_tail_append_cdf_mirror_loop(spark, tmp_path):
    """Checkpointed typed-feed consumer: a mirror applying deletes
    then inserts per version equals the table after every call; the
    cursor advances only after process returns; idle calls are no-ops;
    bootstrap delivers the DV-applied snapshot as inserts."""
    from cuplyr_spark.sources.connectors import tail_append_cdf

    d = _mk(spark, tmp_path, "t25")
    delete_append_rows(spark, d, {"id": ("<", 5)})  # pre-bootstrap
    cur = str(tmp_path / "cur25")
    mirror = {}

    def apply(frame, up_to):
        pdf = frame.df.toPandas()
        for k in sorted(pdf["_commit_version"].unique()):
            win = pdf[pdf["_commit_version"] == k]
            for _, r in win[win["_change_type"] == "delete"].iterrows():
                mirror.pop(r["id"], None)
            for _, r in win[win["_change_type"] == "insert"].iterrows():
                mirror[r["id"]] = r["v"]

    def table_now():
        return {
            r["id"]: r["v"]
            for r in read_append_snapshot(spark, d).df.collect()
        }

    frm, to = tail_append_cdf(spark, d, cur, apply)
    assert (frm, to) == (0, 3)
    assert mirror == table_now()  # bootstrap excludes deleted rows
    # idle: no new version, process not called
    frm, to = tail_append_cdf(spark, d, cur, apply)
    assert frm == to == 3
    # a delta window with delete + update, applied incrementally
    update_append_rows(spark, d, "id >= 98", {"v": "v * 10"})
    delete_append_rows(spark, d, {"id": [(">=", 10), ("<", 12)]})
    frm, to = tail_append_cdf(spark, d, cur, apply)
    assert (frm, to) == (3, 5)
    assert mirror == table_now()
    assert mirror[98] == 98 * 2 * 10 and 10 not in mirror


def test_dv_lifecycle_under_file_scheme(spark, tmp_path):
    """Row-level writes through the Hadoop FileSystem path (file://):
    DV write, read anti-join, purge-compaction sidecar handling and
    the vacuum DV sweep all route through the remote-FS branches."""
    from cuplyr_spark.sources.connectors import _TableFS

    d = str(tmp_path / "dv_scheme")
    uri = "file://" + d
    df = spark.range(60).select(
        F.col("id").cast("long"), (F.col("id") * 2).alias("v")
    )
    append_snapshot(Frame(df, ()), uri, batch_id=0)
    assert _TableFS(uri, spark).remote
    v, n = delete_append_rows(spark, uri, {"id": ("<", 15)})
    assert n == 15
    assert read_append_snapshot(spark, uri).df.count() == 45
    # bare-path read sees the same table (one filesystem location)
    assert read_append_snapshot(spark, d).df.count() == 45
    v, n = update_append_rows(spark, uri, "id >= 55", {"v": "v + 7"})
    assert n == 5
    got = {r["id"]: r["v"] for r in read_append_snapshot(spark, uri).df.collect()}
    assert got[55] == 117 and got[50] == 100
    cv = compact_append_snapshot(
        spark, uri, target_file_bytes=1 << 30, purge_deletes=True
    )
    assert cv is not None
    vacuum_append_snapshot(uri, keep_last=1, orphan_grace_hours=0, spark=spark)
    assert not os.listdir(os.path.join(d, "_delete"))
    assert read_append_snapshot(spark, uri).df.count() == 45


def test_partition_scoped_delete_prunes_from_manifest(spark, tmp_path):
    """partition_filter deletes prune candidate segments from the
    manifest partition MAP (zero listing) — the 'drop a day' shape —
    proven by removing the non-matching segment's directory."""
    d = str(tmp_path / "t26")
    mk = lambda lo, hi, p: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("long"), F.lit(p).alias("p"),
    )
    append_snapshot(Frame(mk(0, 40, "a"), ()), d, batch_id=0, partition_by="p")
    append_snapshot(Frame(mk(40, 80, "b"), ()), d, batch_id=1)
    a_seg = _log(d, 2)["segments"][0]
    shutil.rmtree(os.path.join(d, a_seg))  # would fail if listed
    # partition-only delete (where omitted)
    v, n = delete_append_rows(spark, d, partition_filter={"p": "b"})
    assert n == 40
    # combined: partition scope + dict where (on the restored table)
    d2 = str(tmp_path / "t26b")
    append_snapshot(Frame(mk(0, 40, "a"), ()), d2, batch_id=0, partition_by="p")
    append_snapshot(Frame(mk(40, 80, "b"), ()), d2, batch_id=1)
    v, n = delete_append_rows(
        spark, d2, {"id": ("<", 50)}, partition_filter={"p": "b"}
    )
    assert n == 10  # ids 40..49 in partition b only
    got = sorted(r["id"] for r in read_append_snapshot(spark, d2).df.collect())
    assert got == list(range(40)) + list(range(50, 80))
    # guards
    with pytest.raises(ValueError, match="unconditional"):
        delete_append_rows(spark, d2)
    with pytest.raises(ValueError, match="not partition columns"):
        delete_append_rows(spark, d2, partition_filter={"id": 1})


def test_update_refuses_unconditional(spark, tmp_path):
    d = _mk(spark, tmp_path, "t27", two_batches=False)
    with pytest.raises(ValueError, match="unconditional"):
        update_append_rows(spark, d, None, {"v": "v + 1"})
    # explicit where=True is the sanctioned full-table form
    v, n = update_append_rows(spark, d, True, {"v": "v + 1"})
    assert n == 100


def test_cdf_returns_fully_deleted_window_segment(spark, tmp_path):
    """rows-as-appended CDF must return a window segment's rows even
    after that segment is FULLY deleted later — the fully-deleted-
    segment skip only applies when deletes are being applied."""
    d = _mk(spark, tmp_path, "t28")  # v1: id<50, v2: id>=50
    v, n = delete_append_rows(spark, d, {"id": (">=", 50)})
    assert n == 50  # the v2 segment is now 100% deleted
    ch = read_append_changes(spark, d, since_version=1)
    assert sorted(r["id"] for r in ch.df.collect()) == list(range(50, 100))
    # and with apply_deletes=True it is (correctly) empty
    assert (
        read_append_changes(
            spark, d, since_version=1, apply_deletes=True
        ).df.count()
        == 0
    )
    # the typed feed also replays the full lifecycle
    from cuplyr_spark.sources.connectors import read_append_cdf

    cdf = read_append_cdf(spark, d, since_version=1)
    by = {}
    for r in cdf.df.collect():
        by.setdefault((r["_change_type"], r["_commit_version"]), set()).add(
            r["id"]
        )
    assert by[("insert", 2)] == set(range(50, 100))
    assert by[("delete", 3)] == set(range(50, 100))
