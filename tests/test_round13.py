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
    with open(os.path.join(d, "_LOG.1")) as f:
        target_segs = json.load(f)["segments"]
    with open(os.path.join(d, "_LOG.3")) as f:
        head = json.load(f)
    victim = [s for s in target_segs if s not in head["segments"]][0]

    real_write_log = C._write_log

    def racing_write_log(fs, log):
        # simulate a vacuum sweeping the target's segment AFTER the
        # existence pre-check but BEFORE the publish — then let the
        # publish proceed
        if log.get("restored_from") == 1 and os.path.isdir(
            os.path.join(d, victim)
        ):
            shutil.rmtree(os.path.join(d, victim))
        return real_write_log(fs, log)

    monkeypatch.setattr(C, "_write_log", racing_write_log)
    with pytest.raises(FileNotFoundError, match="rolled forward"):
        restore_append_snapshot(spark, d, 1)
    monkeypatch.undo()

    # head is the roll-forward: same live content as pre-restore
    got = read_append_snapshot(spark, d).collect()
    assert sorted(got["id"].tolist()) == [0, 1]
    with open(os.path.join(d, "_LATEST_LOG")) as f:
        v = int(f.read().strip())
    with open(os.path.join(d, f"_LOG.{v}")) as f:
        final = json.load(f)
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
    with open(os.path.join(table, "_LATEST_LOG")) as f:
        v = int(f.read().strip())
    with open(os.path.join(table, f"_LOG.{v}")) as f:
        assert json.load(f)["unique_key"] == ["k"]
