"""Optimistic concurrency for snapshot + append tables.

The layer's multi-writer model (module docstring of
``sources/connectors.py``): version allocation by atomic
exclusive-create, monotonic pointer swaps, serialized
read-modify-write commits (``_NEXT.<base>`` marker with crash
roll-forward), and internally-retried append log commits. Races are
simulated deterministically by pre-creating the exact file the "other
writer" would have created — every interleaving tested here is one a
real concurrent writer produces.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from cuplyr_spark import from_pandas
from cuplyr_spark.sources.connectors import (
    ConcurrentWriteError,
    _TableFS,
    append_snapshot,
    compact_snapshot,
    latest_snapshot_version,
    read_append_snapshot,
    read_snapshot,
    upsert_snapshot,
    vacuum_snapshots,
    write_snapshot,
)


def _df(spark, rows, cols=("k", "v")):
    return from_pandas(spark, pd.DataFrame(rows, columns=list(cols)))


# -- CAS primitive -------------------------------------------------------


def test_write_text_exclusive_single_winner(tmp_path):
    fs = _TableFS(str(tmp_path))
    fs.mkdirs()
    assert fs.write_text_exclusive("_CLAIM.1", "", ".a") is True
    assert fs.write_text_exclusive("_CLAIM.1", "", ".b") is False
    # the loser's tmp never lingers
    assert sorted(os.listdir(tmp_path)) == ["_CLAIM.1"]


# -- version allocation --------------------------------------------------


def test_claimed_version_never_reused(spark, tmp_path):
    """A claim by a racing (or crashed) writer makes the next publish
    skip that number — two writers can never share a v= dir."""
    d = str(tmp_path / "t")
    write_snapshot(_df(spark, [(1, "a")]), d)
    _TableFS(d).write_text_exclusive("_CLAIM.2", "", ".x")  # rival claim
    v = write_snapshot(_df(spark, [(2, "b")]), d)
    assert v == 3
    assert latest_snapshot_version(d) == 3


def test_pointer_never_regresses(spark, tmp_path):
    """A slow writer finishing an OLD version cannot move the pointer
    backwards past a newer publish (the monotonic swap)."""
    from cuplyr_spark.sources.connectors import _MANIFEST, _advance_ptr

    d = str(tmp_path / "t")
    write_snapshot(_df(spark, [(1, "a")]), d)
    write_snapshot(_df(spark, [(2, "b")]), d)
    fs = _TableFS(d)
    _advance_ptr(fs, _MANIFEST, 1, "tmp")  # the slow writer's late swap
    assert latest_snapshot_version(d) == 2


# -- read-modify-write serialization ------------------------------------


def test_upsert_conflict_detected_not_lost(spark, tmp_path):
    """Two writers both merge on top of v1; the slower one must get
    ConcurrentWriteError, not silently erase the winner's rows."""
    d = str(tmp_path / "t")
    write_snapshot(_df(spark, [(1, "a"), (2, "b")]), d)
    # writer A wins: its commit marker + published version exist
    v2 = upsert_snapshot(spark, _df(spark, [(2, "B")]), d, key="k")
    assert v2 == 2
    # writer B computed its merge against v1 — simulate its publish
    from cuplyr_spark.sources.connectors import _publish

    with pytest.raises(ConcurrentWriteError, match="moved from v1"):
        _publish(
            d,
            spark,
            lambda p: _df(spark, [(9, "z")]).df.write.parquet(p),
            expected_base=1,
        )
    # winner's merge intact
    rows = dict(read_snapshot(spark, d).df.collect())
    assert rows == {1: "a", 2: "B"}


def test_crashed_winner_rolled_forward(spark, tmp_path):
    """Writer A wrote v2 + its _NEXT.1 marker, then died before the
    pointer swap. Writer B (also based on v1) must roll A forward and
    raise — A's commit survives, B's does not."""
    d = str(tmp_path / "t")
    write_snapshot(_df(spark, [(1, "a")]), d)
    fs = _TableFS(d)
    # simulate A: complete v=2 data + marker, no pointer swap
    _df(spark, [(1, "A")]).df.write.parquet(fs.join("v=2"))
    assert fs.write_text_exclusive("_NEXT.1", "2", ".n")
    assert latest_snapshot_version(d) == 1
    with pytest.raises(ConcurrentWriteError):
        upsert_snapshot(spark, _df(spark, [(1, "B")]), d, key="k")
    # A's crashed commit is now published (rolled forward by the loser)
    assert latest_snapshot_version(d) == 2
    assert dict(read_snapshot(spark, d).df.collect()) == {1: "A"}
    # and B's normal retry path now lands cleanly on the new base
    upsert_snapshot(spark, _df(spark, [(1, "B")]), d, key="k")
    assert dict(read_snapshot(spark, d).df.collect()) == {1: "B"}


def test_compact_conflict_detected(spark, tmp_path):
    """A merge landing while compaction rewrites must not be erased by
    the compaction's publish."""
    d = str(tmp_path / "t")
    write_snapshot(_df(spark, [(i, "x") for i in range(20)]), d)
    fs = _TableFS(d)
    # another writer superseded v1 while "our" compactor was reading it
    assert fs.write_text_exclusive("_NEXT.1", "999", ".n")
    with pytest.raises(ConcurrentWriteError):
        compact_snapshot(spark, d, target_file_bytes=1 << 30, shuffle=False)


def test_vacuum_sweeps_claims_and_markers(spark, tmp_path):
    d = str(tmp_path / "t")
    write_snapshot(_df(spark, [(0, "x")]), d)
    for i in range(3):
        upsert_snapshot(spark, _df(spark, [(i, "y")]), d, key="k")
    fs = _TableFS(d)
    removed = vacuum_snapshots(d, keep_last=2)
    assert removed == [1, 2]
    names = set(os.listdir(d))
    # removed versions' claims and commit markers are swept ...
    assert "_CLAIM.1" not in names and "_CLAIM.2" not in names
    assert "_NEXT.1" not in names and "_NEXT.2" not in names
    # ... kept versions' are not, and the table still reads
    assert "_CLAIM.4" in names and "_NEXT.3" in names
    assert read_snapshot(spark, d).df.count() == 3


# -- append-table log commit races ---------------------------------------


def _fake_competing_log(d, version, extra=None, watermarks=None):
    """A competing appender's winning commit: the atomic _LOG.<version>
    file, deliberately WITHOUT its pointer swap — the hardest
    interleaving (winner died mid-publish); the loser must both heal
    the pointer and rebase."""
    fs = _TableFS(d)
    # materialize the predecessor (may be a delta record); the forged
    # competitor commits FULL-form — a legal record at any version
    from cuplyr_spark.sources.connectors import _read_log

    cur = _read_log(fs, version - 1)
    log = dict(cur)
    log["version"] = version
    log["segments"] = list(cur["segments"]) + (extra or [])
    if watermarks is not None:
        log["watermarks"] = watermarks
    assert fs.write_text_exclusive(f"_LOG.{version}", json.dumps(log), ".t")


def test_append_retries_past_competing_commit(spark, tmp_path):
    """Loser of the log-commit race rebases on the winner's log and
    republishes — both appends' rows survive."""
    d = str(tmp_path / "t")
    append_snapshot(_df(spark, [(1, "a")]), d)
    # the competitor wins version 2 (re-registering v1's segment list)
    _fake_competing_log(d, 2)
    v = append_snapshot(_df(spark, [(2, "b")]), d)
    assert v == 3  # rebased past the competitor
    rows = dict(read_append_snapshot(spark, d).df.collect())
    assert rows == {1: "a", 2: "b"}


def test_append_replay_race_is_noop(spark, tmp_path):
    """Two sinks replaying the SAME (app_id, batch_id) race: the loser
    must detect the winner's watermark on rebase and no-op, not
    double-append."""
    d = str(tmp_path / "t")
    append_snapshot(_df(spark, [(1, "a")]), d, batch_id=0, app_id="q")
    # competitor lands batch 1 first
    _fake_competing_log(d, 2, watermarks={"q": 1})
    v = append_snapshot(_df(spark, [(2, "b")]), d, batch_id=1, app_id="q")
    assert v == 2  # the winner's version — our segment became an orphan
    rows = dict(read_append_snapshot(spark, d).df.collect())
    assert rows == {1: "a"}  # competitor's fake log added no real rows


def test_write_text_exclusive_hadoop_route(spark, tmp_path):
    """The Hadoop FileContext branch (rename WITHOUT overwrite) has the
    same single-winner semantics as the os.link branch — exercised via
    file://, the one Hadoop scheme the container can host. Atomic on
    HDFS too; S3A is documented as needing external coordination."""
    d = str(tmp_path / "x")
    os.makedirs(d)
    fs = _TableFS("file://" + d, spark)
    assert fs.remote
    assert fs.write_text_exclusive("_LOG.7", "winner", ".t1") is True
    assert fs.write_text_exclusive("_LOG.7", "loser", ".t2") is False
    assert fs.read_text("_LOG.7") == "winner"
    # the loser's tmp file is cleaned up
    assert not os.path.exists(os.path.join(d, "_LOG.7.t2"))


# -- r9/r10 commit-record machinery --------------------------------------


def test_stale_writer_pointer_regression_healed(spark, tmp_path):
    """The pointer-only TOCTOU race: a stale writer of v1 re-renames
    the pointer back to 1 AFTER v2 published. Readers must still see
    v2 (its immutable _PUB.2 record is independent evidence), and the
    next publish heals the pointer file itself."""
    d = str(tmp_path / "t")
    write_snapshot(_df(spark, [(1, "a")]), d)
    write_snapshot(_df(spark, [(2, "b")]), d)
    assert latest_snapshot_version(d) == 2
    # the stale writer's late rename lands
    with open(os.path.join(d, "_LATEST"), "w") as f:
        f.write("1")
    assert latest_snapshot_version(d) == 2  # healed by the _PUB floor
    assert len(read_snapshot(spark, d).collect()) == 1
    assert dict(read_snapshot(spark, d).df.collect()) == {2: "b"}
    v = write_snapshot(_df(spark, [(3, "c")]), d)
    assert v == 3
    with open(os.path.join(d, "_LATEST")) as f:
        assert int(f.read().strip()) == 3  # pointer file healed too


def test_advance_ptr_returns_once_commit_record_durable(tmp_path):
    """Once the commit evidence (_PUB.n) is durable, a pointer that
    can never be advanced (persistently corrupt reads) must NOT raise
    — readers already see the version via the floor, and raising
    would make append_snapshot's rebase loop double-append."""
    from cuplyr_spark.sources.connectors import _advance_ptr

    fs = _TableFS(str(tmp_path))
    fs.mkdirs()
    fs.write_text_exclusive("_PUB.5", "", ".p")

    class _CorruptPtrFS(_TableFS):
        def read_text(self, name):
            if name == "_LATEST":
                return "garbage"  # every read is torn
            return super().read_text(name)

    cfs = _CorruptPtrFS(str(tmp_path))
    # evidence says v5 committed -> durable success, no raise
    _advance_ptr(
        cfs, "_LATEST", 5, "tmp",
        committed=lambda: 5,
    )


def test_advance_ptr_raises_without_commit_evidence(tmp_path):
    """Same persistently-corrupt pointer, but NO independent commit
    evidence: the publish must not report success (r8 verdict ask)."""
    from cuplyr_spark.sources.connectors import _advance_ptr

    class _CorruptPtrFS(_TableFS):
        def read_text(self, name):
            if name == "_LATEST":
                return "garbage"
            return super().read_text(name)

    fs = _CorruptPtrFS(str(tmp_path))
    fs.mkdirs()
    with pytest.raises(ConcurrentWriteError, match="could not be advanced"):
        _advance_ptr(fs, "_LATEST", 5, "tmp", committed=lambda: 0)


def test_log_pointer_torn_read_heals(spark, tmp_path):
    """A torn/corrupt _LATEST_LOG pointer must not crash readers: the
    newest immutable _LOG.<k> manifest is the real commit record and
    the read falls back to it (mirrors latest_snapshot_version)."""
    d = str(tmp_path / "t")
    append_snapshot(_df(spark, [(1, "a")]), d, batch_id=0)
    append_snapshot(_df(spark, [(2, "b")]), d, batch_id=1)
    with open(os.path.join(d, "_LATEST_LOG"), "w") as f:
        f.write("not-a-number")
    rows = dict(read_append_snapshot(spark, d).df.collect())
    assert rows == {1: "a", 2: "b"}
    # and a regressed (stale-writer) log pointer is healed by the floor
    with open(os.path.join(d, "_LATEST_LOG"), "w") as f:
        f.write("1")
    rows = dict(read_append_snapshot(spark, d).df.collect())
    assert rows == {1: "a", 2: "b"}


def test_vacuum_sweeps_pub_records(spark, tmp_path):
    """_PUB.<n> records for vacuumed versions are swept with them, so
    the directory listing every read pays stays bounded by retention."""
    d = str(tmp_path / "t")
    for i in range(4):
        write_snapshot(_df(spark, [(i, "x")]), d)
    assert vacuum_snapshots(d, keep_last=2) == [1, 2]
    names = set(os.listdir(d))
    assert "_PUB.3" in names and "_PUB.4" in names
    assert "_PUB.1" not in names and "_PUB.2" not in names
    assert latest_snapshot_version(d) == 4


def test_rebase_carries_zone_maps_and_orphan_sidecar_swept(spark, tmp_path):
    """The loser of a log-commit race rebases WITHOUT losing metadata:
    its own segment's zone maps land in the rebased log alongside the
    winner's. And a replay-race orphan's sketch sidecar is swept with
    the orphan segment by vacuum."""
    import shutil

    from cuplyr_spark.sources.connectors import (
        _read_log,
        vacuum_append_snapshot,
    )

    d = str(tmp_path / "t")
    append_snapshot(_df(spark, [(1, "a")]), d, batch_id=0, app_id="q")
    _fake_competing_log(d, 2)  # winner (re-registers v1's segments)
    v = append_snapshot(_df(spark, [(2, "b")]), d, batch_id=1, app_id="q")
    assert v == 3
    log = _read_log(_TableFS(d))
    assert len(log["segments"]) == 2
    # both segments carry zone maps in the rebased log
    for s in log["segments"]:
        assert log["stats"][s]["cols"]["k"][2] == 0  # nulls recorded
    assert log["stats"][log["segments"][1]]["cols"]["k"][:2] == [2, 2]

    # a crashed writer's orphan (segment written + sidecar written, log
    # commit never happened — the exact on-disk state a kill between
    # _write_segment_sketch and _write_log leaves): vacuum must sweep
    # the sidecar together with the orphan segment
    d2 = str(tmp_path / "t2")
    spec = {"distinct": ["k"]}
    append_snapshot(
        _df(spark, [(1, "a")]), d2, batch_id=0, app_id="q",
        sketch_spec=spec,
    )
    live = set(_read_log(_TableFS(d2))["segments"])
    (seg1,) = live
    orphan = "seg=2-deadbeef"
    shutil.copytree(os.path.join(d2, seg1), os.path.join(d2, orphan))
    shutil.copytree(
        os.path.join(d2, "_sketch", seg1),
        os.path.join(d2, "_sketch", orphan),
    )
    removed = vacuum_append_snapshot(d2, keep_last=2, orphan_grace_hours=0)
    assert removed == [orphan]
    assert not os.path.exists(os.path.join(d2, "_sketch", orphan))
    assert os.path.isdir(os.path.join(d2, "_sketch", seg1))  # live kept
