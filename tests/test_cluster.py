"""Key-clustered append tables: range-clustered segment writes +
per-FILE zone maps in the manifest, so key-addressed reads and the
row-level writes' probe scans open file-grain bytes instead of
segment-grain. The mechanical contract under test is `inputFiles()`:
the DataFrame a pruned read builds must reference ONLY the files
whose recorded cluster-key range can match — soundness is proven the
zone-map way (results identical to read+filter), tightness by the
file count.

No reference counterpart (the reference has no file scans at all,
SURVEY.md §2.1); the design follows Delta liquid clustering /
Iceberg sort orders as public art, at the segment grain this
manifest owns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    _TableFS,
    _file_prune,
    _normalize_stats_filter,
    _read_log,
    append_snapshot,
    compact_append_snapshot,
    delete_append_rows,
    explain_append_scan,
    read_append_changes,
    read_append_snapshot,
    update_append_rows,
    upsert_append_rows,
)


def _mk(spark, lo, hi, tag="x"):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        F.lit(tag).alias("tag"),
    )
    return Frame(df, ())


def _mk_part(spark, lo, hi):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("day"),
        (F.col("id") * 2.0).alias("v"),
    )
    return Frame(df, ())


def _files(frame) -> set[str]:
    return set(frame.df.inputFiles())


def test_manifest_records_cluster_layout(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 4000), d, cluster_by="k", cluster_files=4)
    append_snapshot(_mk(spark, 4000, 8000), d, cluster_files=4)
    log = _read_log(_TableFS(d, spark))
    assert log["cluster_by"] == ["k"]
    fsm = log["file_stats"]
    assert sorted(fsm) == sorted(log["segments"])
    for seg, files in fsm.items():
        assert len(files) == 4
        for rel, st in files.items():
            assert rel.endswith(".parquet") and "/" not in rel
            mn, mx, nulls = st["cols"]["k"]
            assert mn <= mx and nulls == 0 and st["rows"] > 0
        # range clustering: per-file [min,max] are pairwise disjoint
        spans = sorted(st["cols"]["k"][:2] for st in files.values())
        for (_, amx), (bmn, _) in zip(spans, spans[1:]):
            assert amx < bmn


def test_point_read_opens_one_file_per_matching_segment(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 4000), d, cluster_by="k", cluster_files=4)
    append_snapshot(_mk(spark, 4000, 8000), d, cluster_files=4)
    fr = read_append_snapshot(spark, d, stats_filter={"k": ("==", 1234)})
    assert [(r.k, r.v) for r in fr.df.collect()] == [(1234, 2468.0)]
    # 8 live files; the probe must open exactly the one whose range holds k
    assert len(_files(fr)) == 1
    # range probe spanning both segments still file-prunes
    fr2 = read_append_snapshot(
        spark, d, stats_filter={"k": [(">=", 3900), ("<", 4100)]}
    )
    assert fr2.df.count() == 200
    assert len(_files(fr2)) == 2


def test_where_string_composes_with_file_pruning(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 4000), d, cluster_by="k", cluster_files=4)
    fr = read_append_snapshot(spark, d, where="k >= 100 and k < 110")
    assert fr.df.count() == 10
    assert len(_files(fr)) == 1


def test_pruned_read_equals_full_filter(spark, tmp_path):
    """Soundness: for a grid of probes, pruned read == read+filter."""
    d = str(tmp_path / "t")
    # three appends with interleaved-but-sorted ranges and NULL keys
    for lo, hi in [(0, 1000), (500, 2000), (1500, 3000)]:
        df = spark.range(lo, hi).select(
            F.when(F.col("id") % 97 == 0, None)
            .otherwise(F.col("id"))
            .alias("k"),
            (F.col("id") * 2.0).alias("v"),
        )
        append_snapshot(Frame(df, ()), d, cluster_by="k", cluster_files=3)
    full = read_append_snapshot(spark, d).df
    for filt, cond in [
        ({"k": ("==", 700)}, "k = 700"),
        ({"k": ("<", 50)}, "k < 50"),
        ({"k": [(">", 900), ("<=", 1600)]}, "k > 900 and k <= 1600"),
        ({"k": ("in", [3, 999, 2999])}, "k in (3, 999, 2999)"),
        ({"k": ("==", -5)}, "k = -5"),
    ]:
        got = read_append_snapshot(spark, d, stats_filter=filt).df
        want = full.filter(cond)
        assert sorted(got.collect()) == sorted(want.collect()), filt


def test_delete_probe_is_file_pruned_and_exact(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 4000), d, cluster_by="k", cluster_files=4)
    append_snapshot(_mk(spark, 4000, 8000), d, cluster_files=4)
    log = _read_log(_TableFS(d, spark))
    sfilt = _normalize_stats_filter({"k": ("in", [10, 20])}, log["schema"])
    segs, fmap = _file_prune(log, log["segments"], sfilt)
    assert len(segs) == 1 and len(fmap[segs[0]]) == 1
    v, n = delete_append_rows(spark, d, {"k": ("in", [10, 20])})
    assert n == 2
    assert read_append_snapshot(spark, d).df.count() == 7998
    # a second delete through a DV-carrying segment stays exact
    v, n = delete_append_rows(spark, d, {"k": ("<", 5)})
    assert n == 5
    got = read_append_snapshot(spark, d, stats_filter={"k": ("<", 30)})
    assert sorted(r.k for r in got.df.collect()) == sorted(
        x for x in range(5, 30) if x not in (10, 20)
    )


def test_update_and_upsert_keep_cluster_layout(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 4000), d, cluster_by="k", cluster_files=4)
    v, n = update_append_rows(spark, d, {"k": ("<", 10)}, {"v": "v + 0.5"})
    assert n == 10
    src = Frame(
        spark.range(3995, 4005).select(
            F.col("id").alias("k"),
            F.lit(-1.0).alias("v"),
            F.lit("up").alias("tag"),
        ),
        (),
    )
    v, nr, na = upsert_append_rows(src, d, "k")
    assert (nr, na) == (5, 10)
    log = _read_log(_TableFS(d, spark))
    # every new segment (update copy + merge batch) carries file stats
    assert sorted(log["file_stats"]) == sorted(log["segments"])
    got = read_append_snapshot(spark, d, stats_filter={"k": ("<", 10)}).df
    assert sorted((r.k, r.v) for r in got.collect()) == [
        (i, i * 2.0 + 0.5) for i in range(10)
    ]
    got2 = read_append_snapshot(spark, d, stats_filter={"k": (">=", 3995)})
    assert got2.df.count() == 10
    assert all(r.v == -1.0 for r in got2.df.collect())


def test_compaction_reclusters_the_fold(spark, tmp_path):
    d = str(tmp_path / "t")
    for i in range(4):
        append_snapshot(
            _mk(spark, i * 1000, (i + 1) * 1000), d,
            cluster_by="k", cluster_files=2,
        )
    # ~10 KB per segment: a 12 KB target folds everything into one
    # multi-file fold, so re-clustering is observable at file grain
    v = compact_append_snapshot(spark, d, target_file_bytes=12 * 1024)
    assert v is not None
    log = _read_log(_TableFS(d, spark))
    (fold,) = log["segments"]
    assert fold.startswith("fold=")
    assert sorted(log["file_stats"]) == [fold]
    assert len(log["file_stats"][fold]) > 1
    # the fold is re-clustered: a point probe opens a strict subset
    fr = read_append_snapshot(spark, d, stats_filter={"k": ("==", 2500)})
    assert [(r.k,) for r in fr.df.select("k").collect()] == [(2500,)]
    assert len(_files(fr)) < len(log["file_stats"][fold])
    # time travel to a pre-fold version still reads (and still prunes)
    old = read_append_snapshot(spark, d, version=2, stats_filter={"k": ("==", 500)})
    assert old.df.count() == 1


def test_partitioned_and_clustered_compose(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(
        _mk_part(spark, 0, 3000), d,
        partition_by="day", cluster_by=["k"], cluster_files=3,
    )
    append_snapshot(_mk_part(spark, 3000, 6000), d, cluster_files=3)
    log = _read_log(_TableFS(d, spark))
    # relpaths include the partition directory component
    assert all(
        rel.startswith("day=")
        for files in log["file_stats"].values()
        for rel in files
    )
    fr = read_append_snapshot(
        spark, d,
        partition_filter={"day": "1"},
        stats_filter={"k": ("==", 100)},
    )
    rows = fr.df.collect()
    assert [(r.k, r.day) for r in rows] == [(100, "1")]
    # file grain: 1 of 3 range slices survives -> <= 3 files (one per
    # day dir inside the slice), out of 9 total in the segment
    assert len(_files(fr)) <= 3
    # partition-scoped key delete stays exact
    v, n = delete_append_rows(
        spark, d, {"k": ("<", 10)}, partition_filter={"day": "0"}
    )
    assert n == 4  # k in {0,3,6,9}
    assert read_append_snapshot(spark, d).df.count() == 5996


def test_change_feed_file_prunes_the_window(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 2000), d, cluster_by="k", cluster_files=2)
    append_snapshot(_mk(spark, 2000, 4000), d, cluster_files=2)
    fr = read_append_changes(spark, d, since_version=1, where="k = 2100")
    assert [(r.k,) for r in fr.df.select("k").collect()] == [(2100,)]
    assert len(_files(fr)) == 1  # one file of the one window segment


def test_explain_reports_file_budget(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 4000), d, cluster_by="k", cluster_files=4)
    append_snapshot(_mk(spark, 4000, 8000), d, cluster_files=4)
    rep = {
        r["segment"]: r.asDict()
        for r in explain_append_scan(
            spark, d, stats_filter={"k": ("==", 100)}
        ).df.collect()
    }
    by_action = {r["action"]: r for r in rep.values()}
    assert by_action["pruned"]["pruned_by"] == "zone_map"
    assert by_action["pruned"]["files_scan"] == 0
    assert by_action["scan"]["files_total"] == 4
    assert by_action["scan"]["files_scan"] == 1
    # decision parity at file grain: the read opens exactly files_scan
    fr = read_append_snapshot(spark, d, stats_filter={"k": ("==", 100)})
    assert len(_files(fr)) == by_action["scan"]["files_scan"]


def test_cluster_spec_is_fixed_at_creation(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 100), d, cluster_by="k")
    with pytest.raises(ValueError, match="does not match the table's"):
        append_snapshot(_mk(spark, 100, 200), d, cluster_by="v")
    # inheritance: omitting cluster_by keeps clustering
    append_snapshot(_mk(spark, 100, 200), d)
    log = _read_log(_TableFS(d, spark))
    assert log["cluster_by"] == ["k"] and len(log["file_stats"]) == 2


def test_cluster_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="partition columns"):
        append_snapshot(
            _mk_part(spark, 0, 10), str(tmp_path / "a"),
            partition_by="day", cluster_by="day",
        )
    with pytest.raises(ValueError, match="not in the frame"):
        append_snapshot(_mk(spark, 0, 10), str(tmp_path / "b"), cluster_by="nope")
    with pytest.raises(ValueError, match="at least one column"):
        append_snapshot(_mk(spark, 0, 10), str(tmp_path / "c"), cluster_by=[])


def test_string_cluster_column_truncated_bounds_stay_sound(spark, tmp_path):
    d = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        F.concat(
            F.lit("doc-"), F.lpad(F.col("id").cast("string"), 6, "0"),
            # long suffix exercises the min/max prefix truncation
            F.lit("-" + "x" * 80),
        ).alias("doc"),
        F.col("id").alias("n"),
    )
    append_snapshot(Frame(df, ()), d, cluster_by="doc", cluster_files=4)
    key = "doc-000555-" + "x" * 80
    fr = read_append_snapshot(spark, d, stats_filter={"doc": ("==", key)})
    assert [r.n for r in fr.df.collect()] == [555]
    assert len(_files(fr)) == 1


def test_unclustered_tables_are_unaffected(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 1000), d)
    log = _read_log(_TableFS(d, spark))
    assert "cluster_by" not in log and "file_stats" not in log
    fr = read_append_snapshot(spark, d, stats_filter={"k": ("==", 5)})
    assert fr.df.count() == 1


def test_streaming_sink_inherits_clustering(spark, tmp_path):
    """A clustered table created up front, then fed by the streaming
    append sink: the sink passes cluster_by=None per microbatch and
    inheritance applies the table's layout — every streamed segment
    gets range-clustered files + per-file zone maps, so key probes
    over streamed data prune exactly like batch appends."""
    import os

    import pandas as pd

    from cuplyr_spark.streaming.stream import stream_append_snapshot

    src = str(tmp_path / "src")
    os.makedirs(src)
    table = str(tmp_path / "tbl")
    # create the table clustered (the sink's appends inherit)
    append_snapshot(
        _mk(spark, 0, 1000), table, batch_id=0, app_id="seed",
        cluster_by="k", cluster_files=2,
    )
    pd.DataFrame(
        {"k": list(range(1000, 2000)),
         "v": [float(i) * 2 for i in range(1000, 2000)],
         "tag": ["s"] * 1000}
    ).to_parquet(f"{src}/b0.parquet", index=False)
    q = stream_append_snapshot(
        spark.readStream.schema("k long, v double, tag string").parquet(src),
        table, checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    log = _read_log(_TableFS(table, spark))
    assert len(log["segments"]) == 2
    assert sorted(log["file_stats"]) == sorted(log["segments"])
    fr = read_append_snapshot(spark, table, stats_filter={"k": ("==", 1500)})
    assert [(r.k, r.v) for r in fr.df.collect()] == [(1500, 3000.0)]
    # the probe opens one file of the streamed segment, none of seed's
    assert len(_files(fr)) == 1


def test_multi_column_cluster(spark, tmp_path):
    """cluster_by=[a, b]: lexicographic range clustering; file stats
    recorded per column; a probe on the LEADING column file-prunes."""
    d = str(tmp_path / "t")
    df = spark.range(0, 4000).select(
        (F.col("id") % 50).alias("a"),
        F.col("id").alias("b"),
        (F.col("id") * 1.0).alias("v"),
    )
    append_snapshot(Frame(df, ()), d, cluster_by=["a", "b"], cluster_files=5)
    log = _read_log(_TableFS(d, spark))
    assert log["cluster_by"] == ["a", "b"]
    for st in log["file_stats"][log["segments"][0]].values():
        assert set(st["cols"]) == {"a", "b"}
    fr = read_append_snapshot(spark, d, stats_filter={"a": ("==", 7)})
    assert fr.df.count() == 80
    assert len(_files(fr)) < 5  # leading-column probe skips files
    # trailing-column probe: sound (exact rows) even if pruning is weak
    fr2 = read_append_snapshot(spark, d, stats_filter={"b": ("==", 1234)})
    assert [(r.a, r.b) for r in fr2.df.select("a", "b").collect()] == [
        (1234 % 50, 1234)
    ]


def test_cluster_with_schema_evolution(spark, tmp_path):
    """Additive evolution on a clustered table: the new column rides
    along; cluster columns and file pruning are unaffected; the
    evolved segment gets file stats like any other."""
    d = str(tmp_path / "t")
    append_snapshot(_mk(spark, 0, 2000), d, cluster_by="k", cluster_files=2)
    evolved = Frame(
        spark.range(2000, 4000).select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("v"),
            F.lit("x").alias("tag"),
            F.lit(1).alias("extra"),
        ),
        (),
    )
    append_snapshot(evolved, d, schema_mode="merge", cluster_files=2)
    log = _read_log(_TableFS(d, spark))
    assert sorted(log["file_stats"]) == sorted(log["segments"])
    fr = read_append_snapshot(spark, d, stats_filter={"k": ("==", 100)})
    rows = fr.df.collect()
    assert len(rows) == 1 and rows[0].extra is None  # pre-evolution NULL
    assert len(_files(fr)) == 1
    fr2 = read_append_snapshot(spark, d, stats_filter={"k": ("==", 3000)})
    assert fr2.df.collect()[0].extra == 1
    assert len(_files(fr2)) == 1


def test_zorder_fold_gets_file_grain_pruning(spark, tmp_path):
    """An UNCLUSTERED table compacted with zorder_by: the fold records
    per-file zone maps for the z-order columns, so point probes
    file-prune the fold — and the entries survive later appends (the
    carry is independent of cluster_by)."""
    d = str(tmp_path / "t")
    for i in range(4):
        append_snapshot(_mk(spark, i * 1000, (i + 1) * 1000), d)
    log0 = _read_log(_TableFS(d, spark))
    assert "file_stats" not in log0 and "cluster_by" not in log0
    v = compact_append_snapshot(
        spark, d, target_file_bytes=12 * 1024, zorder_by=["k"]
    )
    assert v is not None
    log = _read_log(_TableFS(d, spark))
    (fold,) = log["segments"]
    assert "cluster_by" not in log
    fst = log["file_stats"][fold]
    assert len(fst) > 1
    assert all(set(st["cols"]) == {"k"} for st in fst.values())
    fr = read_append_snapshot(spark, d, stats_filter={"k": ("==", 1500)})
    assert [(r.k,) for r in fr.df.select("k").collect()] == [(1500,)]
    assert len(_files(fr)) < len(fst)
    # a later append must not drop the fold's entries
    append_snapshot(_mk(spark, 4000, 5000), d)
    log2 = _read_log(_TableFS(d, spark))
    assert fold in log2["file_stats"]
    fr2 = read_append_snapshot(spark, d, stats_filter={"k": ("==", 1500)})
    assert fr2.df.count() == 1
    assert len(_files(fr2)) < len(fst) + 1  # fold still file-pruned
