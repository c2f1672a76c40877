"""Write-time UNIQUE-key constraint on append tables
(`append_snapshot(unique_key=)`): the guarantee neither Delta nor
Iceberg enforces natively. Under test: SQL UNIQUE semantics (NULLs
exempt), reject-whole-batch vs insert-ignore, the pruned existence
probe, the upsert/update guards that keep the invariant, and the
rebase re-probe that turns a concurrent conflicting append into
ConcurrentWriteError instead of a silent violation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    ConcurrentWriteError,
    _TableFS,
    _read_log,
    append_snapshot,
    compact_append_snapshot,
    delete_append_rows,
    read_append_snapshot,
    update_append_rows,
    upsert_append_rows,
)


def _mk(spark, rows):
    return Frame(spark.createDataFrame(rows, "id long, v string"), ())


def _ids(spark, d):
    return sorted(
        r.id
        for r in read_append_snapshot(spark, d).df.collect()
        if r.id is not None
    )


def test_constraint_stamped_and_inherited(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, [(1, "a")]), d, unique_key="id")
    assert _read_log(_TableFS(d, spark))["unique_key"] == ["id"]
    # inherited: the second append is checked without re-passing it
    with pytest.raises(ValueError, match="already exists"):
        append_snapshot(_mk(spark, [(1, "dup")]), d)
    # explicit mismatch refused
    with pytest.raises(ValueError, match="does not match the table's"):
        append_snapshot(_mk(spark, [(2, "b")]), d, unique_key="v")
    with pytest.raises(ValueError, match="not in the frame"):
        append_snapshot(
            _mk(spark, [(1, "a")]), str(tmp_path / "u"), unique_key="nope"
        )


def test_in_batch_duplicates(spark, tmp_path):
    d = str(tmp_path / "t")
    with pytest.raises(ValueError, match="within itself"):
        append_snapshot(
            _mk(spark, [(1, "a"), (1, "b")]), d, unique_key="id"
        )
    # drop keeps exactly one (arbitrary) row per key
    append_snapshot(
        _mk(spark, [(1, "a"), (1, "b"), (2, "c")]), d,
        unique_key="id", on_conflict="drop",
    )
    assert _ids(spark, d) == [1, 2]


def test_null_keys_are_exempt(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(
        _mk(spark, [(1, "a"), (None, "n1"), (None, "n2")]), d,
        unique_key="id",
    )
    append_snapshot(_mk(spark, [(2, "b"), (None, "n3")]), d)
    rows = read_append_snapshot(spark, d).df.collect()
    assert sorted(r.v for r in rows if r.id is None) == ["n1", "n2", "n3"]


def test_insert_ignore_vs_table(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(
        _mk(spark, [(i, f"v{i}") for i in range(10)]), d, unique_key="id"
    )
    v = append_snapshot(
        _mk(spark, [(i, "new") for i in range(5, 15)]), d,
        on_conflict="drop",
    )
    assert _ids(spark, d) == list(range(15))
    # existing rows kept their original values (ignore, not upsert)
    vals = {
        r.id: r.v for r in read_append_snapshot(spark, d).df.collect()
    }
    assert vals[7] == "v7" and vals[12] == "new"


def test_probe_reads_through_deletion_vectors(spark, tmp_path):
    """A deleted key is re-insertable: the probe anti-joins the DVs."""
    d = str(tmp_path / "t")
    append_snapshot(
        _mk(spark, [(i, f"v{i}") for i in range(10)]), d, unique_key="id"
    )
    delete_append_rows(spark, d, {"id": ("==", 3)})
    append_snapshot(_mk(spark, [(3, "back")]), d)  # accepted: key is dead
    vals = {
        r.id: r.v for r in read_append_snapshot(spark, d).df.collect()
    }
    assert vals[3] == "back" and len(vals) == 10


def test_multi_column_key(spark, tmp_path):
    d = str(tmp_path / "t")
    df = Frame(
        spark.createDataFrame(
            [(1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0)],
            "x long, y string, v double",
        ),
        (),
    )
    append_snapshot(df, d, unique_key=["x", "y"])
    with pytest.raises(ValueError, match="already exists"):
        append_snapshot(
            Frame(
                spark.createDataFrame([(1, "b", 9.0)], "x long, y string, v double"),
                (),
            ),
            d,
        )


def test_upsert_and_update_guards(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(
        _mk(spark, [(1, "a"), (2, "b")]), d, unique_key="id"
    )
    with pytest.raises(ValueError, match="must equal the constraint"):
        upsert_append_rows(_mk(spark, [(3, "c")]), d, key="v")
    with pytest.raises(ValueError, match="repeats key"):
        upsert_append_rows(_mk(spark, [(3, "c"), (3, "d")]), d, key="id")
    v, nr, na = upsert_append_rows(
        _mk(spark, [(2, "B"), (3, "c")]), d, key="id"
    )
    assert (nr, na) == (1, 2) and _ids(spark, d) == [1, 2, 3]
    with pytest.raises(ValueError, match="UNIQUE constraint"):
        update_append_rows(spark, d, {"id": ("==", 1)}, {"id": "id + 10"})
    v, n = update_append_rows(spark, d, {"id": ("==", 1)}, {"v": "'A'"})
    assert n == 1 and _ids(spark, d) == [1, 2, 3]


def test_constraint_survives_compaction_and_carries(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, [(1, "a")]), d, unique_key="id")
    append_snapshot(_mk(spark, [(2, "b")]), d)
    compact_append_snapshot(spark, d, target_file_bytes=1 << 30)
    assert _read_log(_TableFS(d, spark))["unique_key"] == ["id"]
    with pytest.raises(ValueError, match="already exists"):
        append_snapshot(_mk(spark, [(2, "dup")]), d)


def test_concurrent_conflicting_append_raises(spark, tmp_path):
    """Deterministic interleaving: a writer commits a conflicting key
    between this append's probe and its log commit — the rebase
    re-probe must surface ConcurrentWriteError, never publish a
    violated constraint."""
    import cuplyr_spark.sources.connectors as C

    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, [(1, "a")]), d, unique_key="id")
    orig = C._write_log
    fired = {"n": 0}

    def racing(fs, log, prev=None):
        if fired["n"] == 0 and fs.dir.endswith("/t"):
            fired["n"] += 1
            # the racing writer lands key 7 first (bypasses the spy
            # by restoring the original for its own commit)
            C._write_log = orig
            try:
                append_snapshot(_mk(spark, [(7, "theirs")]), d)
            finally:
                C._write_log = racing
        return orig(fs, log, prev=prev)

    C._write_log = racing
    try:
        with pytest.raises(ConcurrentWriteError, match="cannot rebase"):
            append_snapshot(_mk(spark, [(7, "ours")]), d)
    finally:
        C._write_log = orig
    # the loser's staged segment is an orphan; the table holds ONE 7
    vals = {
        r.id: r.v for r in read_append_snapshot(spark, d).df.collect()
    }
    assert vals == {1: "a", 7: "theirs"}


def test_non_conflicting_concurrent_append_rebases(spark, tmp_path):
    """Same interleaving with DISJOINT keys: the rebase re-probe finds
    no conflict and the append lands normally."""
    import cuplyr_spark.sources.connectors as C

    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, [(1, "a")]), d, unique_key="id")
    orig = C._write_log
    fired = {"n": 0}

    def racing(fs, log, prev=None):
        if fired["n"] == 0 and fs.dir.endswith("/t"):
            fired["n"] += 1
            C._write_log = orig
            try:
                append_snapshot(_mk(spark, [(7, "theirs")]), d)
            finally:
                C._write_log = racing
        return orig(fs, log, prev=prev)

    C._write_log = racing
    try:
        append_snapshot(_mk(spark, [(9, "ours")]), d)
    finally:
        C._write_log = orig
    assert _ids(spark, d) == [1, 7, 9]
