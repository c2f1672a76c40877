"""Manifest checkpointing: _LOG.<n> records only the commit's delta
(cost ∝ the change), every _CHECKPOINT_EVERY-th commit folds the full
state into an immutable _CHECKPOINT.<n>, and readers reconstruct any
version from the nearest base — the public Delta-log design (delta
actions + periodic checkpoint) rebuilt jar-free on this layer's
exclusive-create commit records. Pre-delta tables (all-full-form logs)
keep reading unchanged and their next commit starts the chain.

The reference has no storage layer (SURVEY.md §2.1)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import cuplyr_spark.sources.connectors as C
from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    _apply_log_delta,
    _log_delta,
    _read_log,
    _TableFS,
    append_history,
    append_snapshot,
    compact_append_snapshot,
    delete_append_rows,
    read_append_changes,
    read_append_snapshot,
    restore_append_snapshot,
    vacuum_append_snapshot,
)


def _raw(d, v):
    with open(os.path.join(d, f"_LOG.{v}")) as f:
        return json.load(f)


def _append_one(spark, d, i, **kw):
    df = spark.createDataFrame([(i, f"v{i}")], "id long, v string")
    append_snapshot(Frame(df, ()), d, batch_id=i, **kw)


def test_delta_roundtrip_unit():
    prev = {
        "version": 4,
        "segments": ["seg=1-a", "seg=2-b"],
        "schema": [["id", "bigint"]],
        "stats": {"seg=1-a": {"rows": 5}, "seg=2-b": {"rows": 6}},
        "deletes": {"seg=1-a": ["dv/x"]},
        "watermarks": {"__default__": 3},
    }
    new = {
        "version": 5,
        "segments": ["seg=2-b", "seg=3-c"],
        "schema": [["id", "bigint"]],
        "stats": {"seg=2-b": {"rows": 6}, "seg=3-c": {"rows": 1}},
        "watermarks": {"__default__": 4},
        "max_batch_id": 4,
    }
    d = _log_delta(prev, new)
    assert d["seg_add"] == ["seg=3-c"] and d["seg_rm"] == ["seg=1-a"]
    assert _apply_log_delta(prev, d) == new
    # unreconstructible order (reordered survivors) -> full-form fallback
    assert _log_delta(
        {"version": 1, "segments": ["a", "b"]},
        {"version": 2, "segments": ["b", "a"]},
    ) is None


def test_commits_are_delta_form_and_checkpoint_cadence(spark, tmp_path):
    d = str(tmp_path / "t")
    for i in range(12):
        _append_one(spark, d, i)
    assert "delta" not in _raw(d, 1)  # first commit: full manifest
    r2 = _raw(d, 2)
    assert r2.get("delta") == 1 and "segments" not in r2
    assert len(r2["seg_add"]) == 1
    # cadence: version 10 checkpointed, others not
    assert os.path.exists(os.path.join(d, "_CHECKPOINT.10"))
    assert not os.path.exists(os.path.join(d, "_CHECKPOINT.9"))
    ck = json.load(open(os.path.join(d, "_CHECKPOINT.10")))
    assert ck["version"] == 10 and len(ck["segments"]) == 10

    # every version time-travels; head reconstructs across the chain
    for v in range(1, 13):
        assert len(_read_log(_TableFS(d), v)["segments"]) == v
    got = read_append_snapshot(spark, d).collect()
    assert sorted(got["id"].tolist()) == list(range(12))
    # reconstructed head == checkpoint + rolled deltas, bit-for-bit
    assert _read_log(_TableFS(d), 10) == ck


def test_commit_bytes_flat_in_table_size(spark, tmp_path):
    """The structural claim: an append to a 30-segment table writes a
    commit record ∝ the batch, not ∝ the table (the old monolithic
    manifest re-serialized all segments + zone maps each commit)."""
    d = str(tmp_path / "flat")
    sizes = []
    for i in range(30):
        _append_one(spark, d, i)
        v = i + 1
        if v > 1:
            sizes.append(os.path.getsize(os.path.join(d, f"_LOG.{v}")))
    # per-commit record size stays flat (each adds one segment's
    # entry); allow slack for growing version digits
    assert max(sizes) < min(sizes) * 1.5
    # and is far below the full-state size
    full = len(json.dumps(_read_log(_TableFS(d))))
    assert max(sizes) < full / 5


def test_deletes_updates_and_restore_through_delta_chain(spark, tmp_path):
    d = str(tmp_path / "ops")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )
    append_snapshot(Frame(df.filter("id < 50"), ()), d, batch_id=0)
    append_snapshot(Frame(df.filter("id >= 50"), ()), d, batch_id=1)
    delete_append_rows(spark, d, "id < 10")
    C.update_append_rows(spark, d, "id >= 90", {"v": "v + 1000"})
    got = read_append_snapshot(spark, d).collect().sort_values("id")
    assert got["id"].min() == 10 and len(got) == 90
    assert got["v"].tail(10).ge(1000).all()
    # restore to pre-delete, via the chain
    restore_append_snapshot(spark, d, 2)
    assert len(read_append_snapshot(spark, d).collect()) == 100
    # incremental window across delta records: v2's segment (50 rows)
    # plus the update's patch segment (10 rewritten rows)
    ch = read_append_changes(spark, d, since_version=1).collect()
    assert sorted(ch["id"].tolist()) == sorted(
        list(range(50, 100)) + list(range(90, 100))
    )


def test_vacuum_keeps_kept_versions_reconstructible(spark, tmp_path):
    d = str(tmp_path / "vac")
    for i in range(13):
        _append_one(spark, d, i)
    swept = vacuum_append_snapshot(d, keep_last=3, spark=spark)
    assert swept == []  # all segments still referenced by the head
    fs = _TableFS(d)
    # kept floor (version 11) must have gained a checkpoint base: its
    # _LOG.11 is delta-form and everything below is gone
    assert not os.path.exists(os.path.join(d, "_LOG.10"))
    assert os.path.exists(os.path.join(d, "_CHECKPOINT.11"))
    # stale cadence checkpoint swept with its version
    assert not os.path.exists(os.path.join(d, "_CHECKPOINT.10"))
    for v in (11, 12, 13):
        assert len(_read_log(fs, v)["segments"]) == v
    assert len(read_append_snapshot(spark, d).collect()) == 13
    # history walks only retained versions
    hist = append_history(d, spark)
    assert [h["version"] for h in hist] == [11, 12, 13]


def test_legacy_full_form_table_reads_and_upgrades(spark, tmp_path):
    """A pre-delta table (every _LOG.<k> a full manifest) keeps
    reading; its next commit writes a delta against the full head."""
    d = str(tmp_path / "legacy")
    for i in range(4):
        _append_one(spark, d, i)
    fs = _TableFS(d)
    # rewrite history as an old-layout table: all-full-form manifests,
    # no checkpoints
    for v in range(1, 5):
        state = _read_log(fs, v)
        with open(os.path.join(d, f"_LOG.{v}"), "w") as f:
            json.dump(state, f)
    for name in os.listdir(d):
        if name.startswith("_CHECKPOINT."):
            os.remove(os.path.join(d, name))
    assert len(read_append_snapshot(spark, d).collect()) == 4
    _append_one(spark, d, 4)
    assert _raw(d, 5).get("delta") == 1
    assert len(read_append_snapshot(spark, d).collect()) == 5
    for v in range(1, 6):
        assert len(_read_log(fs, v)["segments"]) == v


def test_compaction_fold_as_delta(spark, tmp_path):
    d = str(tmp_path / "fold")
    for i in range(4):
        _append_one(spark, d, i)
    compact_append_snapshot(spark, d, 1 << 30)
    rec = _raw(d, 5)
    assert rec.get("delta") == 1
    assert len(rec["seg_rm"]) == 4 and rec["seg_add"][0].startswith("fold=")
    assert len(read_append_snapshot(spark, d).collect()) == 4


def test_concurrent_writer_loser_rebases_on_delta_chain(spark, tmp_path):
    """The exclusive-create CAS is unchanged; the loser's rebase
    re-reads the winner's state through reconstruction."""
    d = str(tmp_path / "race")
    _append_one(spark, d, 0)
    fs = _TableFS(d)
    cur = _read_log(fs)
    # a competitor publishes version 2 out from under us (full-form —
    # any form is a legal commit record)
    winner = dict(cur)
    winner["version"] = 2
    assert fs.write_text_exclusive("_LOG.2", json.dumps(winner), ".t")
    # our append must rebase to version 3, not clobber
    _append_one(spark, d, 1)
    fs2 = _TableFS(d)
    head = _read_log(fs2)
    assert head["version"] == 3
    assert len(read_append_snapshot(spark, d).collect()) == 2
