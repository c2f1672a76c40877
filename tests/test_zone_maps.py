"""Manifest-level column statistics (zone maps) for append tables.

The 100 TB read-path lever: per-segment min/max/null-count recorded in
the log manifest at append/compact time lets a filtered read prune
whole segments BEFORE any filesystem listing — the jar-free analog of
Delta's per-file stats, lifted to the segment grain where the manifest
lives. Exactness is guarded by applying the same predicate as a real
Spark filter over the segments that survive pruning.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from cuplyr_spark import from_pandas
from cuplyr_spark.sources.connectors import (
    _read_log,
    _TableFS,
    append_snapshot,
    compact_append_snapshot,
    read_append_changes,
    read_append_snapshot,
)


def _batch(spark, lo, hi, tag="x"):
    n = hi - lo
    return from_pandas(
        spark,
        pd.DataFrame(
            {
                "k": range(lo, hi),
                "v": [float(i) for i in range(lo, hi)],
                "s": [f"{tag}{i:04d}" for i in range(lo, hi)],
            }
        ),
    )


def test_stats_recorded_in_log(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_batch(spark, 0, 100), d, batch_id=0)
    append_snapshot(_batch(spark, 100, 200), d, batch_id=1)
    log = _read_log(_TableFS(d))
    stats = log.get("stats")
    assert stats and len(stats) == 2
    seg0, seg1 = log["segments"]
    assert stats[seg0]["rows"] == 100
    assert stats[seg0]["cols"]["k"] == [0, 99, 0]
    assert stats[seg1]["cols"]["k"] == [100, 199, 0]
    assert stats[seg0]["cols"]["v"] == [0.0, 99.0, 0]
    assert stats[seg0]["cols"]["s"][:2] == ["x0000", "x0099"]


def test_stats_prune_segments_before_listing(spark, tmp_path):
    """A segment whose recorded range cannot match is never LISTED,
    let alone read — proven by deleting its directory outright and
    still reading successfully."""
    d = str(tmp_path / "t")
    append_snapshot(_batch(spark, 0, 100), d, batch_id=0)
    append_snapshot(_batch(spark, 100, 200), d, batch_id=1)
    log = _read_log(_TableFS(d))
    seg0, seg1 = log["segments"]
    shutil.rmtree(os.path.join(d, seg0))  # k in [0, 99] gone from disk
    out = read_append_snapshot(spark, d, stats_filter={"k": (">=", 150)})
    got = sorted(r["k"] for r in out.df.collect())
    assert got == list(range(150, 200))  # exact: residual filter applied
    # the equality form and the list form
    out = read_append_snapshot(spark, d, stats_filter={"k": 150})
    assert [r["k"] for r in out.df.collect()] == [150]
    out = read_append_snapshot(
        spark, d, stats_filter={"k": [(">=", 150), ("<", 155)]}
    )
    assert sorted(r["k"] for r in out.df.collect()) == [150, 151, 152, 153, 154]


def test_stats_filter_exact_on_overlap(spark, tmp_path):
    """Overlapping ranges: nothing is pruned, the residual filter
    keeps the result exact."""
    d = str(tmp_path / "t")
    append_snapshot(_batch(spark, 0, 100), d, batch_id=0)
    append_snapshot(_batch(spark, 50, 150), d, batch_id=1)
    out = read_append_snapshot(spark, d, stats_filter={"k": ("<", 60)})
    got = sorted(r["k"] for r in out.df.collect())
    assert got == sorted(list(range(0, 60)) + list(range(50, 60)))


def test_stats_string_and_null_bounds(spark, tmp_path):
    """String bounds prune too (truncation keeps min a valid lower
    bound and bumps max to a valid upper bound); all-NULL segments
    prune under any value predicate."""
    d = str(tmp_path / "t")
    append_snapshot(
        from_pandas(
            spark, pd.DataFrame({"k": [1, 2], "s": ["aa", "bb"]})
        ),
        d,
        batch_id=0,
    )
    append_snapshot(
        from_pandas(
            spark,
            pd.DataFrame({"k": [3, 4], "s": pd.array([None, None], dtype="string[python]")}),
        ),
        d,
        batch_id=1,
    )
    log = _read_log(_TableFS(d))
    seg0, seg1 = log["segments"]
    assert log["stats"][seg1]["cols"]["s"] == [None, None, 2]
    # the all-NULL segment is pruned for any s predicate
    shutil.rmtree(os.path.join(d, seg1))
    out = read_append_snapshot(spark, d, stats_filter={"s": ("<=", "az")})
    assert [r["s"] for r in out.df.collect()] == ["aa"]


def test_stats_long_string_truncation_bounds(spark, tmp_path):
    """Strings beyond the 64-char cap: the stored min is a prefix
    (valid lower bound) and the stored max is the prefix with its last
    char bumped (valid upper bound) — pruning stays sound."""
    d = str(tmp_path / "t")
    long_lo = "b" * 100
    long_hi = "m" * 100
    append_snapshot(
        from_pandas(spark, pd.DataFrame({"s": [long_lo, long_hi]})),
        d,
        batch_id=0,
    )
    log = _read_log(_TableFS(d))
    (seg,) = log["segments"]
    mn, mx, nulls = log["stats"][seg]["cols"]["s"]
    assert mn == "b" * 64  # prefix: <= true min
    assert mx == "m" * 63 + "n"  # bumped prefix: >= true max
    # sound under both predicates
    out = read_append_snapshot(spark, d, stats_filter={"s": (">=", "m")})
    assert [r["s"] for r in out.df.collect()] == [long_hi]
    out = read_append_snapshot(spark, d, stats_filter={"s": ("<", "a")})
    assert out.df.count() == 0


def test_stats_fold_merges_without_rescan(spark, tmp_path):
    """Compaction merges folded segments' stats arithmetically (min of
    mins, max of maxes, summed null counts) — exact, no extra pass."""
    d = str(tmp_path / "t")
    append_snapshot(_batch(spark, 0, 100), d, batch_id=0)
    append_snapshot(_batch(spark, 100, 200), d, batch_id=1)
    v = compact_append_snapshot(spark, d, target_file_bytes=1 << 30)
    assert v is not None
    log = _read_log(_TableFS(d))
    (fold,) = log["segments"]
    assert fold.startswith("fold=")
    assert log["stats"][fold]["rows"] == 200
    assert log["stats"][fold]["cols"]["k"] == [0, 199, 0]
    assert log["stats"][fold]["cols"]["s"][:2] == ["x0000", "x0199"]
    # and pruning works through the fold
    out = read_append_snapshot(spark, d, stats_filter={"k": ("<", 5)})
    assert sorted(r["k"] for r in out.df.collect()) == [0, 1, 2, 3, 4]


def test_stats_filter_validation(spark, tmp_path):
    d = str(tmp_path / "t")
    append_snapshot(_batch(spark, 0, 10), d, batch_id=0)
    with pytest.raises(ValueError, match="not a column"):
        read_append_snapshot(spark, d, stats_filter={"nope": 1})
    with pytest.raises(ValueError, match="operator"):
        read_append_snapshot(spark, d, stats_filter={"k": ("~", 1)})


def test_cdf_stats_and_partition_maps_survive_fold(spark, tmp_path):
    """read_append_changes takes each new segment's stats/partition
    metadata from the log version that ADDED it, so manifest-level
    pruning keeps working even when a LATER fold dropped the segment
    from the current log's maps (r8 verdict carry: the change feed
    previously lost pruning across a fold)."""
    d = str(tmp_path / "t")
    append_snapshot(_batch(spark, 0, 100), d, batch_id=0)  # v1
    append_snapshot(_batch(spark, 100, 200), d, batch_id=1)  # v2
    log2 = _read_log(_TableFS(d))
    seg1, seg2 = log2["segments"]
    v = compact_append_snapshot(spark, d, target_file_bytes=1 << 30)  # v3
    assert v == 3
    # the fold dropped seg1/seg2 from the CURRENT log's stats map;
    # the change feed must recover them from v1/v2. Delete seg1's dir:
    # if pruning is manifest-level, the read never notices.
    shutil.rmtree(os.path.join(d, seg1))
    out = read_append_changes(
        spark, d, since_version=0, version=2, stats_filter={"k": (">=", 150)}
    )
    assert sorted(r["k"] for r in out.df.collect()) == list(range(150, 200))


def test_cdf_partition_map_survives_fold(spark, tmp_path):
    """Same recovery for hive-partition maps: a partition_filter on a
    CDF window whose segments were later folded still prunes whole
    segments from the manifest."""
    pdf = pd.DataFrame(
        {"k": range(8), "part": ["a"] * 4 + ["b"] * 4}
    )
    d = str(tmp_path / "t")
    append_snapshot(
        from_pandas(spark, pdf[pdf.part == "a"]), d,
        batch_id=0, partition_by=["part"],
    )  # v1
    append_snapshot(
        from_pandas(spark, pdf[pdf.part == "b"]), d, batch_id=1
    )  # v2
    log2 = _read_log(_TableFS(d))
    seg_a, seg_b = log2["segments"]
    v = compact_append_snapshot(spark, d, target_file_bytes=1 << 30)  # v3
    assert v == 3
    shutil.rmtree(os.path.join(d, seg_a))
    out = read_append_changes(
        spark, d, since_version=0, version=2, partition_filter={"part": "b"}
    )
    assert sorted(r["k"] for r in out.df.collect()) == [4, 5, 6, 7]


def test_zorder_within_partitions_compact(spark, tmp_path):
    """OPTIMIZE ZORDER on a hive-partitioned append table: the fold
    keeps the partition layout AND range-clusters files on the z-key
    within each partition directory, so per-file footer min/max stay
    tight (disjoint up to boundary ties) — rows unchanged."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 40_000
    pdf = pd.DataFrame(
        {
            "part": np.where(rng.random(n) < 0.5, "a", "b"),
            "x": rng.integers(0, 1_000_000, n),
            # incompressible pad so the fold spans several files
            "pad": [
                "".join(chr(97 + c) for c in row)
                for row in rng.integers(0, 26, (n, 40))
            ],
        }
    )
    d = str(tmp_path / "t")
    half = n // 2
    append_snapshot(
        from_pandas(spark, pdf.iloc[:half]), d, batch_id=0,
        partition_by=["part"],
    )
    append_snapshot(from_pandas(spark, pdf.iloc[half:]), d, batch_id=1)
    v = compact_append_snapshot(
        spark, d, target_file_bytes=150_000, zorder_by=["x"]
    )
    assert v is not None
    out = read_append_snapshot(spark, d)
    assert out.df.count() == n
    assert int(out.df.selectExpr("sum(x) s").first()["s"]) == int(pdf.x.sum())
    log = _read_log(_TableFS(d))
    (fold,) = [s for s in log["segments"] if s.startswith("fold=")]
    # per-partition-dir footer disjointness on the z column
    import pyarrow.parquet as pq

    for part in ("a", "b"):
        pdir = os.path.join(d, fold, f"part={part}")
        files = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
        assert len(files) >= 2, "need multiple files to prove clustering"
        ranges = []
        for f in files:
            t = pq.read_table(f, columns=["x"])["x"]
            ranges.append((t[0].as_py() if False else min(t.to_pylist()),
                           max(t.to_pylist())))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, f"files overlap on x within part={part}"


# -- sketch sidecar -------------------------------------------------------


def _sketch_table(spark, tmp_path):
    d = str(tmp_path / "sk")
    spec = {"distinct": ["u"], "histogram": {"v": [0.0, 100.0, 20]}}
    append_snapshot(
        from_pandas(
            spark,
            pd.DataFrame({"u": [1, 2, 3, 3], "v": [5.0, 15.0, 25.0, 95.0]}),
        ),
        d,
        batch_id=0,
        sketch_spec=spec,
    )
    append_snapshot(
        from_pandas(
            spark,
            pd.DataFrame({"u": [3, 4, 5, 6], "v": [5.0, 45.0, 55.0, 65.0]}),
        ),
        d,
        batch_id=1,
    )
    return d


def test_sketch_sidecar_rows_and_merge(spark, tmp_path):
    """One sidecar row per segment at ingest; table_stats folds them:
    exact summed row count, HLL-union distinct estimate (exact at this
    cardinality), exact element-wise histogram sum — and the fold
    merges sidecars arithmetically, so stats are IDENTICAL across a
    compaction."""
    from cuplyr_spark.sources.connectors import table_stats

    d = _sketch_table(spark, tmp_path)
    log = _read_log(_TableFS(d))
    for s in log["segments"]:
        assert os.path.isdir(os.path.join(d, "_sketch", s))
    before = table_stats(spark, d).df.first().asDict()
    assert before["rows"] == 8
    assert before["u_distinct_est"] == 6
    assert sum(before["v_hist"]) == 8
    v = compact_append_snapshot(spark, d, target_file_bytes=1 << 30)
    assert v is not None
    after = table_stats(spark, d).df.first().asDict()
    assert after["rows"] == before["rows"]
    assert after["u_distinct_est"] == before["u_distinct_est"]
    assert list(after["v_hist"]) == list(before["v_hist"])
    # the fold's own sidecar exists; quantiles run off the stats row
    log = _read_log(_TableFS(d))
    (fold,) = log["segments"]
    assert os.path.isdir(os.path.join(d, "_sketch", fold))
    from cuplyr_spark.operators.sketch import histogram_quantiles

    q = histogram_quantiles(
        table_stats(spark, d), [0.5], hist_col="v_hist", out="q"
    ).df.first()["q"][0]
    assert abs(q - 35.0) <= 5.0  # within one bin width of the true p50


def test_sketch_sidecar_missing_row_recomputed(spark, tmp_path):
    """A segment whose sidecar row is missing (pre-spec history,
    manual deletion) is sketched on the fly — table_stats never
    returns wrong numbers, it just pays that one segment's scan."""
    from cuplyr_spark.sources.connectors import table_stats

    d = _sketch_table(spark, tmp_path)
    log = _read_log(_TableFS(d))
    shutil.rmtree(os.path.join(d, "_sketch", log["segments"][0]))
    out = table_stats(spark, d).df.first().asDict()
    assert out["rows"] == 8
    assert out["u_distinct_est"] == 6


def test_sketch_spec_fixed_at_creation(spark, tmp_path):
    d = _sketch_table(spark, tmp_path)
    with pytest.raises(ValueError, match="sketch_spec does not match"):
        append_snapshot(
            from_pandas(spark, pd.DataFrame({"u": [9], "v": [1.0]})),
            d,
            batch_id=2,
            sketch_spec={"distinct": ["v"]},
        )
    with pytest.raises(ValueError, match="no sketch columns"):
        append_snapshot(
            from_pandas(spark, pd.DataFrame({"u": [9], "v": [1.0]})),
            str(tmp_path / "sk2"),
            sketch_spec={},
        )


def test_sketch_sidecar_vacuumed_with_segment(spark, tmp_path):
    from cuplyr_spark.sources.connectors import vacuum_append_snapshot

    d = _sketch_table(spark, tmp_path)
    log = _read_log(_TableFS(d))
    seg0 = log["segments"][0]
    compact_append_snapshot(spark, d, target_file_bytes=1 << 30)
    removed = vacuum_append_snapshot(d, keep_last=1, orphan_grace_hours=0)
    assert seg0 in removed
    assert not os.path.exists(os.path.join(d, "_sketch", seg0))


# -- temporal bounds, combined filters, soundness fuzz, streaming ---------


def test_stats_date_timestamp_bounds(spark, tmp_path):
    """Date/timestamp zone maps: bounds are stored as zero-padded ISO
    strings (lexicographic == value order) and user-supplied
    date/datetime filter values normalize into the same domain, so a
    date-range read prunes whole segments — the time-ordered ingest
    case the feature exists for."""
    import datetime as dt

    d = str(tmp_path / "t")
    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(10)]

    def seg(ds):
        return from_pandas(
            spark,
            pd.DataFrame(
                {
                    "day": pd.array(ds, dtype="object"),
                    "ts": [
                        dt.datetime.combine(x, dt.time(12, 30, 0)) for x in ds
                    ],
                    "n": range(len(ds)),
                }
            ),
        )

    append_snapshot(seg(days[:5]), d, batch_id=0)
    append_snapshot(seg(days[5:]), d, batch_id=1)
    log = _read_log(_TableFS(d))
    seg0, seg1 = log["segments"]
    assert log["stats"][seg0]["cols"]["day"][:3] == [
        "2024-01-01", "2024-01-05", 0,
    ]
    assert log["stats"][seg0]["cols"]["ts"][0].startswith("2024-01-01T12:30")
    # a date-typed filter value prunes the first segment entirely
    shutil.rmtree(os.path.join(d, seg0))
    out = read_append_snapshot(
        spark, d, stats_filter={"day": (">=", dt.date(2024, 1, 7))}
    )
    assert sorted(str(r["day"]) for r in out.df.collect()) == [
        "2024-01-07", "2024-01-08", "2024-01-09", "2024-01-10",
    ]
    out = read_append_snapshot(
        spark, d,
        stats_filter={"ts": (">", dt.datetime(2024, 1, 8, 0, 0, 0))},
    )
    assert out.df.count() == 3


def test_partition_and_stats_filters_combine(spark, tmp_path):
    """Both manifest filters at once: partition_filter drops segments
    by recorded partition values, stats_filter drops them by recorded
    ranges, and the survivors get both residuals — exact."""
    d = str(tmp_path / "t")
    pdf = pd.DataFrame(
        {
            "part": ["a"] * 50 + ["b"] * 50,
            "k": list(range(50)) + list(range(50)),
        }
    )
    append_snapshot(
        from_pandas(spark, pdf[pdf.k < 25]), d,
        batch_id=0, partition_by=["part"],
    )
    append_snapshot(from_pandas(spark, pdf[pdf.k >= 25]), d, batch_id=1)
    log = _read_log(_TableFS(d))
    seg_lo, seg_hi = log["segments"]
    shutil.rmtree(os.path.join(d, seg_lo))  # prune must skip it
    out = read_append_snapshot(
        spark, d,
        partition_filter={"part": "a"},
        stats_filter={"k": (">=", 30)},
    )
    assert sorted(r["k"] for r in out.df.collect()) == list(range(30, 50))
    # manifest level dropped seg_lo (dir deleted above, read succeeded);
    # directory level shows as a non-empty PartitionFilters entry in
    # the executed plan (inputFiles() reports the pre-pruning listing,
    # so it cannot witness directory pruning)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "PartitionFilters: []" not in plan


def test_prune_soundness_brute_force():
    """Pure-logic fuzz: for random integer segments and random
    predicates, _seg_stats_match may only return False when NO value
    in the segment satisfies the predicate — pruning must never be
    unsound (dropping a segment that had matching rows)."""
    import random

    from cuplyr_spark.sources.connectors import (
        _normalize_stats_filter,
        _seg_stats_match,
    )

    rng = random.Random(42)
    ops = ["==", "<", "<=", ">", ">=", "in"]
    for _ in range(500):
        n = rng.randint(0, 8)
        vals = [rng.randint(-5, 5) for _ in range(n)]
        nulls = rng.randint(0, 3)
        rows = n + nulls
        st = {
            "rows": rows,
            "cols": {
                "k": [min(vals) if vals else None,
                      max(vals) if vals else None, nulls]
            },
        }
        op = rng.choice(ops)
        v = [rng.randint(-6, 6) for _ in range(rng.randint(1, 3))] \
            if op == "in" else rng.randint(-6, 6)
        filt = _normalize_stats_filter(
            {"k": (op, v)}, [["k", "bigint"]]
        )

        def sat(x):
            if op == "==":
                return x == v
            if op == "<":
                return x < v
            if op == "<=":
                return x <= v
            if op == ">":
                return x > v
            if op == ">=":
                return x >= v
            return x in v

        any_match = any(sat(x) for x in vals)
        kept = _seg_stats_match(st, filt)
        assert kept or not any_match, (
            f"UNSOUND prune: vals={vals} nulls={nulls} op={op} v={v}"
        )


def test_stream_append_sink_stats_and_sidecar(spark, tmp_path):
    """The streaming sink passes collect_stats/sketch_spec through:
    after an availableNow run, the table has zone maps and a sidecar
    row per microbatch segment, and table_stats is exact."""
    from cuplyr_spark.sources.connectors import table_stats
    from cuplyr_spark.streaming.stream import stream_append_snapshot

    src = str(tmp_path / "src")
    os.makedirs(src)
    pd.DataFrame({"k": range(100), "v": [float(i) for i in range(100)]}).to_parquet(
        os.path.join(src, "a.parquet")
    )
    d = str(tmp_path / "t")
    q = stream_append_snapshot(
        spark.readStream.schema("k long, v double").parquet(src),
        d,
        checkpoint=str(tmp_path / "ck"),
        sketch_spec={"distinct": ["k"], "histogram": {"v": [0.0, 100.0, 10]}},
    )
    q.awaitTermination(120)
    log = _read_log(_TableFS(d))
    (seg,) = log["segments"]
    assert log["stats"][seg]["cols"]["k"] == [0, 99, 0]
    assert os.path.isdir(os.path.join(d, "_sketch", seg))
    st = table_stats(spark, d).df.first().asDict()
    assert st["rows"] == 100 and st["k_distinct_est"] == 100


def test_tail_consumer_stats_scoped(spark, tmp_path):
    """A range-scoped exactly-once consumer: bootstrap and every delta
    read prune by zone maps; the cursor still advances over the full
    log."""
    from cuplyr_spark.sources.connectors import tail_append_changes

    d = str(tmp_path / "t")
    cur = str(tmp_path / "cursors")
    seen = []

    def process(changes, up_to):
        seen.append((sorted(r["k"] for r in changes.df.collect()), up_to))

    append_snapshot(_batch(spark, 0, 100), d, batch_id=0)
    tail_append_changes(
        spark, d, cur, process, stats_filter={"k": ("<", 10)}
    )
    append_snapshot(_batch(spark, 100, 200), d, batch_id=1)  # all out of range
    append_snapshot(_batch(spark, 200, 212), d, batch_id=2)
    tail_append_changes(
        spark, d, cur, process, stats_filter={"k": [(">=", 205), ("<", 300)]}
    )
    assert seen[0] == (list(range(10)), 1)
    assert seen[1] == (list(range(205, 212)), 3)


# -- dictionary zone maps (exact low-cardinality value sets) --------------


def test_dictionary_set_prunes_scattered_equality(spark, tmp_path):
    """Categorical columns: both segments span the SAME alphabetic
    range (min/max can't separate them) but their value SETS differ —
    equality and IN filters prune from the recorded dictionary."""
    d = str(tmp_path / "t")
    append_snapshot(
        from_pandas(
            spark,
            pd.DataFrame({"t": ["apple", "zebra"] * 10, "n": range(20)}),
        ),
        d,
        batch_id=0,
    )
    append_snapshot(
        from_pandas(
            spark,
            pd.DataFrame({"t": ["ant", "zoo"] * 10, "n": range(20, 40)}),
        ),
        d,
        batch_id=1,
    )
    log = _read_log(_TableFS(d))
    seg0, seg1 = log["segments"]
    assert log["stats"][seg0]["cols"]["t"][3] == ["apple", "zebra"]
    assert log["stats"][seg1]["cols"]["t"][3] == ["ant", "zoo"]
    # ranges overlap completely; only the dictionary can prune seg1
    shutil.rmtree(os.path.join(d, seg1))
    out = read_append_snapshot(spark, d, stats_filter={"t": "apple"})
    assert out.df.count() == 10
    out = read_append_snapshot(
        spark, d, stats_filter={"t": ("in", ["apple", "zebra"])}
    )
    assert out.df.count() == 20


def test_dictionary_set_fold_union_and_cap(spark, tmp_path):
    """Folds union dictionaries exactly; a union past the cap drops
    the set (range bounds remain); a high-cardinality column never
    records one."""
    from cuplyr_spark.sources.connectors import _STAT_SET_CAP

    d = str(tmp_path / "t")
    append_snapshot(
        from_pandas(
            spark,
            pd.DataFrame({"t": ["a", "b"], "big": ["x0", "x1"]}),
        ),
        d,
        batch_id=0,
    )
    append_snapshot(
        from_pandas(
            spark,
            pd.DataFrame(
                {
                    "t": ["c", "d"],
                    "big": [f"y{i}" for i in range(2)],
                }
            ),
        ),
        d,
        batch_id=1,
    )
    compact_append_snapshot(spark, d, target_file_bytes=1 << 30)
    log = _read_log(_TableFS(d))
    (fold,) = log["segments"]
    assert log["stats"][fold]["cols"]["t"][3] == ["a", "b", "c", "d"]
    # high-cardinality column records no set at segment grain
    d2 = str(tmp_path / "hc")
    append_snapshot(
        from_pandas(
            spark,
            pd.DataFrame({"k": [f"v{i:04d}" for i in range(500)]}),
        ),
        d2,
        batch_id=0,
    )
    log2 = _read_log(_TableFS(d2))
    (seg,) = log2["segments"]
    assert len(log2["stats"][seg]["cols"]["k"]) == 3  # no dictionary
    assert _STAT_SET_CAP == 32  # the documented knob


def test_dictionary_soundness_brute_force():
    """Fuzz the dictionary path too: with a recorded value set, a
    prune may only happen when no segment value satisfies the
    predicate."""
    import random

    from cuplyr_spark.sources.connectors import (
        _STAT_SET_CAP,
        _normalize_stats_filter,
        _seg_stats_match,
    )

    rng = random.Random(7)
    for _ in range(500):
        n = rng.randint(1, 10)
        vals = [rng.randint(-4, 4) for _ in range(n)]
        st = {
            "rows": n,
            "cols": {
                "k": [min(vals), max(vals), 0, sorted(set(vals))]
            },
        }
        assert len(set(vals)) <= _STAT_SET_CAP
        if rng.random() < 0.5:
            v = rng.randint(-5, 5)
            filt = _normalize_stats_filter({"k": ("==", v)}, [["k", "bigint"]])
            assert _seg_stats_match(st, filt) or v not in vals
        else:
            vs = [rng.randint(-5, 5) for _ in range(rng.randint(1, 3))]
            filt = _normalize_stats_filter({"k": ("in", vs)}, [["k", "bigint"]])
            assert _seg_stats_match(st, filt) or not (set(vs) & set(vals))


# -- bloom sidecar (point-lookup pruning for high-cardinality keys) -------


def _bloom_table(spark, tmp_path, m=131072, k=7):
    d = str(tmp_path / "bl")
    spec = {"bloom": {"uid": [m, k]}}
    append_snapshot(
        from_pandas(spark, pd.DataFrame({"uid": list(range(0, 20000, 2))})),
        d, batch_id=0, sketch_spec=spec,
    )
    append_snapshot(
        from_pandas(spark, pd.DataFrame({"uid": list(range(1, 20000, 2))})),
        d, batch_id=1,
    )
    return d


def test_bloom_prunes_point_lookup(spark, tmp_path):
    """High-cardinality scattered ids: ranges fully overlap and the
    dictionary is way past its cap, so only the sidecar bloom can
    prune — proven by deleting the non-matching segment's dir. A
    value present nowhere prunes everything (empty frame, table
    schema). No false negatives by construction (fuzzed below)."""
    d = _bloom_table(spark, tmp_path)
    log = _read_log(_TableFS(d))
    s_even, s_odd = log["segments"]
    assert len(log["stats"][s_even]["cols"]["uid"]) == 3  # no dictionary
    shutil.rmtree(os.path.join(d, s_odd))
    out = read_append_snapshot(spark, d, stats_filter={"uid": 4242})
    assert [r["uid"] for r in out.df.collect()] == [4242]
    out = read_append_snapshot(
        spark, d, stats_filter={"uid": ("in", [100, 4242])}
    )
    assert sorted(r["uid"] for r in out.df.collect()) == [100, 4242]
    # also delete the even segment: a nowhere-present id reads as empty
    shutil.rmtree(os.path.join(d, s_even))
    out = read_append_snapshot(spark, d, stats_filter={"uid": 20001})
    assert out.df.count() == 0
    assert out.df.columns == ["uid"]


def test_bloom_no_false_negatives(spark, tmp_path):
    """A bloom may only produce false positives: every PRESENT value
    must survive pruning. Deterministic (fixed data + sha256)."""
    import random

    d = _bloom_table(spark, tmp_path)
    rng = random.Random(11)
    for v in [rng.randrange(0, 20000) for _ in range(40)]:
        got = read_append_snapshot(
            spark, d, stats_filter={"uid": v}
        ).df.count()
        assert got == 1, f"false negative for uid={v}"


def test_bloom_fold_merges_word_or(spark, tmp_path):
    """Compaction ORs the folded blooms word-wise (bloom of the union
    — exact): lookups keep pruning and keep finding through the
    fold."""
    d = _bloom_table(spark, tmp_path)
    v = compact_append_snapshot(spark, d, target_file_bytes=1 << 30)
    assert v is not None
    log = _read_log(_TableFS(d))
    (fold,) = log["segments"]
    assert os.path.isdir(os.path.join(d, "_sketch", fold))
    out = read_append_snapshot(spark, d, stats_filter={"uid": 4242})
    assert [r["uid"] for r in out.df.collect()] == [4242]
    # nowhere-present id still prunes the (only) fold segment
    out = read_append_snapshot(spark, d, stats_filter={"uid": 20001})
    assert out.df.count() == 0


def test_bloom_validation(spark, tmp_path):
    base = from_pandas(
        spark, pd.DataFrame({"uid": [1], "x": [1.5]})
    )
    with pytest.raises(ValueError, match="multiple of"):
        append_snapshot(
            base, str(tmp_path / "a"), sketch_spec={"bloom": {"uid": [100, 5]}}
        )
    with pytest.raises(ValueError, match="canonical string"):
        append_snapshot(
            base, str(tmp_path / "b"), sketch_spec={"bloom": {"x": [4096, 5]}}
        )


def test_stats_filter_without_stats_is_exact(spark, tmp_path):
    """A table ingested with collect_stats=False has no zone maps:
    stats_filter prunes nothing but the residual predicate still makes
    the result exactly read + filter — the degrade path is never
    wrong, merely unpruned."""
    d = str(tmp_path / "t")
    append_snapshot(_batch(spark, 0, 100), d, batch_id=0, collect_stats=False)
    append_snapshot(_batch(spark, 100, 200), d, batch_id=1, collect_stats=False)
    log = _read_log(_TableFS(d))
    assert "stats" not in log
    out = read_append_snapshot(spark, d, stats_filter={"k": (">=", 150)})
    assert sorted(r["k"] for r in out.df.collect()) == list(range(150, 200))
    # and a mixed table (one stats-less, one with stats) stays exact
    append_snapshot(_batch(spark, 200, 300), d, batch_id=2)
    out = read_append_snapshot(spark, d, stats_filter={"k": ("<", 120)})
    assert sorted(r["k"] for r in out.df.collect()) == list(range(0, 120))


def test_join_prune_filter_prunes_fact_segments(spark, tmp_path):
    """Dynamic file skipping (`connectors.join_prune_filter`): the
    filtered dim's key set becomes a stats_filter IN-clause, so fact
    segments whose zone maps provably miss every key are never opened
    — proven by deleting the non-matching segment's directory."""
    from cuplyr_spark.sources.connectors import join_prune_filter

    d = str(tmp_path / "t")
    append_snapshot(_batch(spark, 0, 100), d, batch_id=0)
    append_snapshot(_batch(spark, 1000, 1100), d, batch_id=1)
    dim = from_pandas(
        spark,
        pd.DataFrame({"key": [1005, 1042, 1077], "label": ["a", "b", "c"]}),
    )
    filt = join_prune_filter(dim, "key", fact_col="k")
    assert filt == {"k": ("in", [1005, 1042, 1077])}
    # the low segment can't match: remove it from disk, read still works
    low_seg = _read_log(_TableFS(d), 1)["segments"][0]
    shutil.rmtree(os.path.join(d, low_seg))
    fact = read_append_snapshot(spark, d, stats_filter=filt)
    out = fact.inner_join(dim, by={"k": "key"})
    got = sorted(r["k"] for r in out.df.collect())
    assert got == [1005, 1042, 1077]


def test_join_prune_filter_guards_and_nulls(spark, tmp_path):
    from cuplyr_spark.sources.connectors import join_prune_filter

    dim = from_pandas(
        spark,
        pd.DataFrame({"key": pd.array([1, 2, None, 2], dtype="Int64")}),
    )
    # NULL keys dropped (equality joins never match them)
    assert join_prune_filter(dim, "key") == {"key": ("in", [1, 2])}
    # over the cap: degrade to the key RANGE (still prunes outside the
    # band; the caller's join stays the exact matcher)
    with pytest.warns(UserWarning, match="degrading"):
        assert join_prune_filter(dim, "key", max_keys=1) == {
            "key": [(">=", 1), ("<=", 2)]
        }
    # all-NULL keys: the empty in-list (nothing can match a key probe)
    nulls = from_pandas(
        spark, pd.DataFrame({"key": pd.array([None, None], dtype="Int64")})
    )
    assert join_prune_filter(nulls, "key") == {"key": ("in", [])}
