"""Incremental materialized aggregate views (`sources/views.py`):
differential exactness against a direct re-aggregate after every kind
of base mutation, both maintenance paths, crash convergence (a
refresh that committed state but not its record), NULL-keyed groups,
vanished groups, full rebuilds, and spec validation."""

from __future__ import annotations

import json
import os
import random
import shutil

import pytest
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    ConcurrentWriteError,
    append_snapshot,
    delete_append_rows,
    read_append_snapshot,
    update_append_rows,
    upsert_append_rows,
)
from cuplyr_spark.sources.views import (
    _window_has_deletes,
    _TableFS,
    append_view_status,
    create_append_view,
    read_append_view,
    refresh_append_view,
)

AGGS = {
    "sx": ("sum", "x"),
    "n": ("count", None),
    "ny": ("count", "y"),
    "mx": ("max", "x"),
    "mn": ("min", "y"),
    "avy": ("mean", "y"),
}


def _mk(spark, rows):
    return Frame(spark.createDataFrame(rows, "g string, x int, y double"), ())


def _direct(spark, base):
    return read_append_snapshot(spark, base).df.groupBy("g").agg(
        F.sum("x").alias("sx"),
        F.count(F.lit(1)).alias("n"),
        F.count("y").alias("ny"),
        F.max("x").alias("mx"),
        F.min("y").alias("mn"),
        F.avg("y").alias("avy"),
    )


def _assert_view_exact(spark, base, view):
    got = {tuple(r) for r in read_append_view(spark, view).df.collect()}
    want = {tuple(r) for r in _direct(spark, base).collect()}
    assert got == want, f"view diverged:\n got={got}\n want={want}"


@pytest.fixture
def dirs(tmp_path):
    return str(tmp_path / "base"), str(tmp_path / "view")


def test_lifecycle_exact_through_both_paths(spark, dirs):
    base, view = dirs
    append_snapshot(
        _mk(spark, [("a", 1, 1.0), ("a", 2, None), ("b", 3, 3.0),
                    (None, 4, 4.0)]), base)
    assert create_append_view(spark, base, view, "g", AGGS) == 1
    _assert_view_exact(spark, base, view)

    # insert-only window → arithmetic merge (asserted via the
    # metadata classifier the refresh itself uses)
    append_snapshot(_mk(spark, [("a", 10, 5.0), ("c", 7, None),
                                (None, 1, None)]), base)
    bfs = _TableFS(base, spark)
    assert not _window_has_deletes(bfs, 1, 2)
    assert refresh_append_view(spark, view) == 2
    _assert_view_exact(spark, base, view)

    # deletes + update → affected-group recompute; 'c' vanishes
    delete_append_rows(spark, base, "x >= 7")
    update_append_rows(spark, base, "g = 'b'", {"x": "x + 100"})
    assert _window_has_deletes(bfs, 2, 4)
    assert refresh_append_view(spark, view) == 4
    _assert_view_exact(spark, base, view)
    groups = {r["g"] for r in read_append_view(spark, view).df.collect()}
    assert "c" not in groups and None in groups

    # vanished group reappears
    append_snapshot(_mk(spark, [("c", 9, 2.0)]), base)
    refresh_append_view(spark, view)
    _assert_view_exact(spark, base, view)
    assert refresh_append_view(spark, view) is None  # already current


def test_null_group_never_duplicates(spark, dirs):
    base, view = dirs
    append_snapshot(_mk(spark, [(None, 1, 1.0)]), base)
    create_append_view(spark, base, view, "g", {"sx": ("sum", "x")})
    for i in range(3):  # each window touches the NULL group again
        append_snapshot(_mk(spark, [(None, 10 + i, None)]), base)
        refresh_append_view(spark, view)
    rows = read_append_view(spark, view).df.collect()
    assert len(rows) == 1 and rows[0]["sx"] == 1 + 10 + 11 + 12
    _assert_view_exact_sum_only(spark, base, view)


def _assert_view_exact_sum_only(spark, base, view):
    got = {tuple(r) for r in read_append_view(spark, view).df.collect()}
    want = {
        tuple(r)
        for r in read_append_snapshot(spark, base).df.groupBy("g")
        .agg(F.sum("x").alias("sx")).collect()
    }
    assert got == want


def test_crash_between_state_commit_and_record_converges(spark, dirs):
    """Simulate the torn refresh: state committed, record never
    written (delete it). The provisional rows must be invisible to
    readers, and the NEXT refresh must converge over them."""
    base, view = dirs
    append_snapshot(_mk(spark, [("a", 1, 1.0), ("b", 2, 2.0)]), base)
    create_append_view(spark, base, view, "g", AGGS)
    before = {tuple(r) for r in read_append_view(spark, view).df.collect()}

    append_snapshot(_mk(spark, [("a", 5, None), (None, 3, 3.0)]), base)
    refresh_append_view(spark, view)
    os.unlink(os.path.join(view, "_REFRESH.2"))  # ← the crash

    # reader still sees the last completed refresh, not the junk
    got = {tuple(r) for r in read_append_view(spark, view).df.collect()}
    assert got == before

    # more base churn, then the retry: wider window, same pinned state
    delete_append_rows(spark, base, "g = 'b'")
    assert refresh_append_view(spark, view) == 3
    _assert_view_exact(spark, base, view)
    # exactly one copy per group in the live state (junk superseded)
    state = read_append_snapshot(spark, os.path.join(view, "state")).df
    dups = (state.groupBy("g").count().filter("count > 1").collect())
    assert dups == []


def test_crash_during_full_rebuild_converges(spark, dirs):
    base, view = dirs
    append_snapshot(_mk(spark, [("a", 1, 1.0), ("b", 2, 2.0)]), base)
    create_append_view(spark, base, view, "g", AGGS)
    append_snapshot(_mk(spark, [("c", 3, 3.0)]), base)
    refresh_append_view(spark, view, full=True)
    os.unlink(os.path.join(view, "_REFRESH.2"))  # crash mid-rebuild
    append_snapshot(_mk(spark, [("a", 4, None)]), base)
    refresh_append_view(spark, view)
    _assert_view_exact(spark, base, view)


def test_upsert_window_takes_recompute_path(spark, dirs):
    base, view = dirs
    append_snapshot(_mk(spark, [("a", 1, 1.0), ("b", 2, 2.0)]), base)
    create_append_view(spark, base, view, "g", AGGS)
    batch = Frame(
        spark.createDataFrame([("b", 2, 9.0), ("d", 8, 8.0)],
                              "g string, x int, y double"), ())
    # keyed MERGE marks DVs → delete_counts increase → recompute path
    upsert_append_rows(batch, base, key=["g", "x"])
    assert _window_has_deletes(_TableFS(base, spark), 1, 2)
    refresh_append_view(spark, view)
    _assert_view_exact(spark, base, view)


def test_spec_validation_and_immutability(spark, dirs):
    base, view = dirs
    append_snapshot(_mk(spark, [("a", 1, 1.0)]), base)
    with pytest.raises(ValueError, match="not in the base"):
        create_append_view(spark, base, view, "g", {"s": ("sum", "zz")})
    with pytest.raises(ValueError, match="op 'median'"):
        create_append_view(spark, base, view, "g", {"s": ("median", "x")})
    with pytest.raises(ValueError, match="needs a column"):
        create_append_view(spark, base, view, "g", {"s": ("sum", None)})
    with pytest.raises(ValueError, match="at least one aggregate"):
        create_append_view(spark, base, view, "g", {})
    create_append_view(spark, base, view, "g", {"sx": ("sum", "x")})
    with pytest.raises(ConcurrentWriteError, match="immutable"):
        create_append_view(spark, base, view, "g", {"sx": ("max", "x")})
    # decimal sums refuse up front
    dec = Frame(
        spark.createDataFrame([("a",)], "g string").select(
            "g", F.lit("1.5").cast("decimal(10,2)").alias("d")), ())
    base2 = base + "_dec"
    append_snapshot(dec, base2)
    with pytest.raises(ValueError, match="decimal"):
        create_append_view(spark, base2, view + "_dec", "g",
                           {"s": ("sum", "d")})


def test_status_reports_lag(spark, dirs):
    base, view = dirs
    append_snapshot(_mk(spark, [("a", 1, 1.0)]), base)
    create_append_view(spark, base, view, "g", {"sx": ("sum", "x")})
    append_snapshot(_mk(spark, [("b", 2, 2.0)]), base)
    st = append_view_status(spark, view)
    assert st["base_version"] == 2 and st["refreshed_base_version"] == 1
    assert st["lag_versions"] == 1
    refresh_append_view(spark, view)
    assert append_view_status(spark, view)["lag_versions"] == 0
    assert [r["seq"] for r in append_view_status(spark, view)["refreshes"]] \
        == [1, 2]


def test_read_before_first_refresh_raises(spark, dirs):
    base, view = dirs
    append_snapshot(_mk(spark, [("a", 1, 1.0)]), base)
    create_append_view(spark, base, view, "g", {"sx": ("sum", "x")},
                       refresh=False)
    with pytest.raises(FileNotFoundError, match="never been refreshed"):
        read_append_view(spark, view)
    with pytest.raises(FileNotFoundError, match="missing _VIEW"):
        read_append_view(spark, view + "_nope")


def test_composite_group_keys(spark, dirs):
    base, view = dirs
    rows = [("a", 1, 1.0), ("a", 1, 2.0), ("a", 2, None), (None, 1, 4.0),
            ("b", None, 5.0)]
    df = spark.createDataFrame(rows, "g string, k int, y double")
    append_snapshot(Frame(df, ()), base)
    create_append_view(spark, base, view, ["g", "k"],
                       {"sy": ("sum", "y"), "n": ("count", None)})
    append_snapshot(
        Frame(spark.createDataFrame(
            [("a", 1, 10.0), (None, 1, None), ("b", None, 1.0)],
            "g string, k int, y double"), ()), base)
    refresh_append_view(spark, view)
    delete_append_rows(spark, base, "y >= 4")
    refresh_append_view(spark, view)
    got = {tuple(r) for r in read_append_view(spark, view).df.collect()}
    want = {
        tuple(r)
        for r in read_append_snapshot(spark, base).df.groupBy("g", "k")
        .agg(F.sum("y").alias("sy"),
             F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [11, 23])
def test_view_model_fuzz(spark, dirs, seed):
    """Randomized base lifecycle (appends / deletes / updates /
    upserts / refreshes in arbitrary interleavings) — after a final
    refresh the view must equal the direct aggregate, every time."""
    base, view = dirs
    rng = random.Random(seed)

    def batch(n):
        return _mk(spark, [
            (rng.choice(["a", "b", "c", "d", None]),
             rng.randrange(100),
             rng.choice([None, float(rng.randrange(50))]))
            for _ in range(n)
        ])

    append_snapshot(batch(20), base)
    create_append_view(spark, base, view, "g", AGGS)
    for _ in range(8):
        op = rng.choice(["append", "delete", "update", "refresh"])
        if op == "append":
            append_snapshot(batch(rng.randrange(1, 10)), base)
        elif op == "delete":
            delete_append_rows(spark, base, f"x % 7 = {rng.randrange(7)}")
        elif op == "update":
            update_append_rows(
                spark, base, f"x % 5 = {rng.randrange(5)}",
                {"y": "coalesce(y, 0.0) + 1.0"})
        else:
            refresh_append_view(spark, view)
    refresh_append_view(spark, view)
    _assert_view_exact(spark, base, view)
