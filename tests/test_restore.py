"""`restore_append_snapshot` — metadata-only RESTORE to an earlier
log version (Delta RESTORE analog). Under test: the restored read
equals the time-travel read of the target, history stays linear with
an audit trail, deletion vectors restore with their version, the
watermark default re-opens the dropped batch window, and a restore
past vacuum refuses instead of publishing a dead (or
row-resurrecting) manifest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    ConcurrentWriteError,
    append_history,
    append_snapshot,
    delete_append_rows,
    read_append_snapshot,
    restore_append_snapshot,
    vacuum_append_snapshot,
)


def _mk(spark, lo, hi):
    return Frame(
        spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        ),
        (),
    )


def _rows(spark, d, **kw):
    return sorted(
        (r.k, r.v) for r in read_append_snapshot(spark, d, **kw).df.collect()
    )


def test_restore_reverts_data_and_audits(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 100), d, batch_id=0)       # v1
    append_snapshot(_mk(spark, 100, 200), d, batch_id=1)     # v2
    delete_append_rows(spark, d, {"k": ("<", 50)})           # v3
    want_v2 = _rows(spark, d, version=2)
    v = restore_append_snapshot(spark, d, 2)                 # v4 == v2 state
    assert v == 4
    assert _rows(spark, d) == want_v2 and len(want_v2) == 200
    # history: linear, with the audit field on the restore version
    hist = {h["version"]: h for h in append_history(d, spark=spark)}
    assert hist[4]["restored_from"] == 2
    assert hist[3]["restored_from"] is None
    # time travel into the in-between version still works
    assert len(_rows(spark, d, version=3)) == 150
    # restoring the current head is a no-op
    assert restore_append_snapshot(spark, d, 4) == 4
    with pytest.raises(ValueError, match="ahead of the published"):
        restore_append_snapshot(spark, d, 99)


def test_restore_to_post_delete_version_keeps_dvs(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 100), d, batch_id=0)       # v1
    delete_append_rows(spark, d, {"k": ("<", 10)})           # v2
    append_snapshot(_mk(spark, 100, 200), d, batch_id=1)     # v3
    restore_append_snapshot(spark, d, 2)                     # v4
    got = _rows(spark, d)
    assert len(got) == 90 and got[0][0] == 10


def test_restore_reopens_watermark_window_by_default(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 50), d, batch_id=0)        # v1
    append_snapshot(_mk(spark, 50, 100), d, batch_id=1)      # v2 (bad batch)
    restore_append_snapshot(spark, d, 1)                     # v3
    # default: the target's watermark is restored, so the re-processed
    # batch 1 is ACCEPTED again
    append_snapshot(_mk(spark, 50, 100), d, batch_id=1)
    assert len(_rows(spark, d)) == 100


def test_keep_watermarks_swallows_the_replay(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 50), d, batch_id=0)        # v1
    append_snapshot(_mk(spark, 50, 100), d, batch_id=1)      # v2
    restore_append_snapshot(spark, d, 1, keep_watermarks=True)
    # the current high-water mark is kept: batch 1 replays as a no-op
    append_snapshot(_mk(spark, 50, 100), d, batch_id=1)
    assert len(_rows(spark, d)) == 50


def test_restore_past_vacuum_refuses(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 50), d, batch_id=0)        # v1
    from cuplyr_spark.sources.connectors import compact_append_snapshot

    append_snapshot(_mk(spark, 50, 100), d, batch_id=1)      # v2
    compact_append_snapshot(spark, d, target_file_bytes=1 << 30)  # v3 fold
    vacuum_append_snapshot(d, keep_last=1, orphan_grace_hours=0, spark=spark)
    with pytest.raises(FileNotFoundError):
        restore_append_snapshot(spark, d, 1)


def test_restore_clustered_table_keeps_file_pruning(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 4000), d, cluster_by="k", cluster_files=4)
    append_snapshot(_mk(spark, 4000, 8000), d, cluster_files=4)  # v2
    delete_append_rows(spark, d, {"k": (">=", 0)})               # v3: all gone
    restore_append_snapshot(spark, d, 2)                          # v4
    fr = read_append_snapshot(spark, d, stats_filter={"k": ("==", 123)})
    assert [(r.k, r.v) for r in fr.df.collect()] == [(123, 246.0)]
    assert len(fr.df.inputFiles()) == 1  # file stats restored with the state


def test_view_refresh_survives_base_restore(spark, tmp_path):
    """A restore in a view's refresh window forces the full-rebuild
    path (the incremental version-diff would double-merge re-added
    segments or keep dropped ones) — the view must equal a
    from-scratch GROUP BY over the restored base."""
    from cuplyr_spark.sources.views import (
        create_append_view,
        read_append_view,
        refresh_append_view,
    )

    base = str(tmp_path / "base")
    vdir = str(tmp_path / "view")

    def mk(lo, hi):
        return Frame(
            spark.range(lo, hi).select(
                F.col("id").alias("k"),
                (F.col("id") % 5).alias("g"),
                (F.col("id") * 2.0).alias("v"),
            ),
            (),
        )

    append_snapshot(mk(0, 100), base, batch_id=0)            # v1
    create_append_view(
        spark, base, vdir,
        group_by="g",
        aggs={"total": ("sum", "v"), "n": ("count", None)},
    )
    append_snapshot(mk(100, 200), base, batch_id=1)          # v2
    refresh_append_view(spark, vdir)                         # view at v2
    restore_append_snapshot(spark, base, 1)                  # v3 == v1 state
    refresh_append_view(spark, vdir)                         # must full-rebuild
    got = {
        r["g"]: (r["total"], r["n"])
        for r in read_append_view(spark, vdir).df.collect()
    }
    want = {
        m: (float(sum(i * 2.0 for i in range(100) if i % 5 == m)), 20)
        for m in range(5)
    }
    assert got == want


def test_tail_consumers_detect_restore(spark, tmp_path):
    """Incremental consumers whose window crosses a restore must not
    silently re-deliver: tail_append_changes raises by default,
    reprocesses the snapshot with on_restore='bootstrap', and reads
    the raw diff with 'ignore'; tail_append_cdf always raises (a
    mirror must reset)."""
    from cuplyr_spark.sources.connectors import (
        compact_append_snapshot,
        tail_append_cdf,
        tail_append_changes,
    )

    d = str(tmp_path / "t")
    cdir = str(tmp_path / "cur")
    seen: list = []

    def proc(fr, v):
        seen.append((v, fr.df.count()))

    append_snapshot(_mk(spark, 0, 100), d, batch_id=0)        # v1
    tail_append_changes(spark, d, cdir, proc)                 # bootstrap
    append_snapshot(_mk(spark, 100, 200), d, batch_id=1)      # v2
    # fold v1+v2 so the restore below re-adds segments the consumer
    # already processed — the exact double-delivery hazard
    compact_append_snapshot(spark, d, target_file_bytes=1 << 30)  # v3
    restore_append_snapshot(spark, d, 2)                      # v4
    with pytest.raises(ValueError, match="crosses restore"):
        tail_append_changes(spark, d, cdir, proc)
    # bootstrap: reprocess the snapshot, cursor advances
    fr, to = tail_append_changes(
        spark, d, cdir, proc, on_restore="bootstrap"
    )
    assert to == 4 and seen[-1] == (4, 200)
    # subsequent windows are clean again
    append_snapshot(_mk(spark, 200, 250), d, batch_id=2)      # v5
    fr, to = tail_append_changes(spark, d, cdir, proc)
    assert to == 5 and seen[-1] == (5, 50)
    # the typed-CDF consumer refuses outright
    cdir2 = str(tmp_path / "cur2")
    seen2: list = []
    tail_append_cdf(spark, d, cdir2, lambda f, v: seen2.append(v))
    restore_append_snapshot(spark, d, 4)                      # v6
    with pytest.raises(ValueError, match="reset the mirror|Reset the mirror"):
        tail_append_cdf(spark, d, cdir2, lambda f, v: seen2.append(v))
