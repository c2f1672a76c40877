"""Round-16 optimization-round internals.

Compaction × counts-only tombstones (the r15 ADVICE findings): a
full-coverage MERGE tombstones a segment arithmetically
(``delete_counts`` == recorded rows, NO deletion-vector file), and
``compact_append_snapshot`` previously keyed both its fold-stats merge
and its fold eligibility off the ``deletes`` map alone — so a
tombstoned segment's dead rows were summed into the fold's recorded
stats/sketches (breaking the additive-exact live-count invariant) and
a right-sized tombstoned segment was never reclaimable. Compaction now
drops fully-dead segments from the new log outright and treats
count-carrying fold members as delete-carrying (stats/sketch
recomputed from the written fold).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    _read_log,
    _TableFS,
    append_snapshot,
    compact_append_snapshot,
    read_append_snapshot,
    upsert_append_rows,
)


def _base_df(spark, n=100):
    return spark.range(n).select(
        F.col("id").cast("long"),
        (F.col("id") % 10).alias("g"),
        (F.col("id") * 2).alias("v"),
    )


def _tombstone_first_segment(spark, d):
    """Full-coverage MERGE: dense int keys -> counts-only tombstone."""
    df = _base_df(spark)
    batch = df.select("id", "g", (F.col("v") + 1).alias("v"))
    upsert_append_rows(Frame(batch, ()), d, key=["id"])
    log = _read_log(_TableFS(d))
    dead = log["segments"][0]
    assert log["delete_counts"] == {dead: 100}
    assert not log.get("deletes")  # tombstone, no DV parquet
    return dead


def test_compaction_fold_stats_exact_with_tombstoned_segment(spark, tmp_path):
    # the ADVICE-high scenario: a fold whose members include a cleanly
    # tombstoned segment must record the fold's ACTUAL rows, not the
    # arithmetic sum that counts the tombstoned segment's dead rows
    d = str(tmp_path / "cmp_tomb")
    append_snapshot(Frame(_base_df(spark), ()), d, batch_id=0)
    dead = _tombstone_first_segment(spark, d)
    # default target_file_bytes: every tiny segment is "fragmented",
    # so everything live folds together
    v = compact_append_snapshot(spark, d)
    assert v is not None
    log = _read_log(_TableFS(d))
    assert dead not in log["segments"]  # dead segment dropped outright
    fold_seg = [s for s in log["segments"] if s.startswith("fold=")]
    assert len(fold_seg) == 1
    got = read_append_snapshot(spark, d).df
    n_actual = got.count()
    assert n_actual == 100
    # the additive-exact invariant: recorded rows == actual rows
    assert log["stats"][fold_seg[0]]["rows"] == n_actual
    assert not log.get("delete_counts")
    assert not log.get("deletes")
    rows = sorted((r["id"], r["v"]) for r in got.collect())
    assert rows == [(i, 2 * i + 1) for i in range(100)]


def test_compaction_drops_dead_segment_metadata_only(spark, tmp_path):
    # nothing fragmented, nothing to purge: a right-sized tombstoned
    # segment still gets dropped, via a metadata-only log version
    d = str(tmp_path / "cmp_dead_only")
    append_snapshot(Frame(_base_df(spark), ()), d, batch_id=0)
    dead = _tombstone_first_segment(spark, d)
    pre = _read_log(_TableFS(d))
    live = [s for s in pre["segments"] if s != dead]
    # target 1 byte: no segment is fragmented -> no fold, only the drop
    v = compact_append_snapshot(spark, d, target_file_bytes=1)
    assert v == pre["version"] + 1
    log = _read_log(_TableFS(d))
    assert log["segments"] == live  # dead dropped, survivor untouched
    assert not any(s.startswith("fold=") for s in log["segments"])
    assert not log.get("delete_counts")
    rows = sorted((r["id"], r["v"]) for r in read_append_snapshot(spark, d).df.collect())
    assert rows == [(i, 2 * i + 1) for i in range(100)]
    # and with nothing dead nor fragmented, compaction is a no-op again
    assert compact_append_snapshot(spark, d, target_file_bytes=1) is None


def test_compaction_dead_drop_preserves_time_travel(spark, tmp_path):
    d = str(tmp_path / "cmp_tt")
    append_snapshot(Frame(_base_df(spark), ()), d, batch_id=0)
    _tombstone_first_segment(spark, d)
    compact_append_snapshot(spark, d, target_file_bytes=1)
    # pre-merge version still reads the original rows (files intact
    # until vacuum)
    old = sorted(
        (r["id"], r["v"])
        for r in read_append_snapshot(spark, d, version=1).df.collect()
    )
    assert old == [(i, 2 * i) for i in range(100)]


def test_compaction_dead_drop_with_sketch_spec(spark, tmp_path):
    # sketch sidecars: a fold containing a count-carrying segment must
    # re-sketch from the written fold, not arithmetically sum the dead
    # segment's sidecar rows
    from cuplyr_spark.sources.connectors import table_stats

    d = str(tmp_path / "cmp_sketch")
    append_snapshot(
        Frame(_base_df(spark), ()), d, batch_id=0,
        sketch_spec={"distinct": ["g"], "histogram": {}, "bloom": {}},
    )
    _tombstone_first_segment(spark, d)
    compact_append_snapshot(spark, d)
    log = _read_log(_TableFS(d))
    assert not log.get("delete_counts")
    row = table_stats(spark, d).df.first().asDict()
    # rows are EXACT from the sidecar: the dead segment's 100 rows
    # must not be double counted into the fold's sketch
    assert row["rows"] == 100
