"""Round-14 fixes (ADVICE closures + verdict forward items).

ADVICE closures:
- medium: vacuum's retention fold now VERIFIES the chain-preserving
  checkpoint landed before sweeping the _LOG records beneath it; a
  failed (not just crashed) write retains the delta chain instead of
  breaking it.
- low: commit timestamps ride every delta record's ``set``
  unconditionally — two metadata-only commits in one millisecond no
  longer produce a ts-less delta that TIMESTAMP-AS-OF would treat as
  pre-timestamp ("matches any as_of").
- low: ``http_if_none_match_put`` treats HTTP 409 (S3
  ConditionalRequestConflict / Azure BlobAlreadyExists) as the CAS
  loss it is, alongside 412.
- low: decimal sum state in incremental views raises loudly on
  decimal(38,s) overflow instead of committing a silent NULL.

Verdict items:
- persistent checkpoint-write failure surfaces as a warning once the
  reconstruction walk exceeds two checkpoint cadences.
- the view-refresh MERGE probe's key-set broadcast is sized from the
  exact batch count (known_bytes), not Catalyst's inflated estimate.

The reference has no storage layer (SURVEY.md §2.1); the designs are
public art (Delta log/checkpoints) rebuilt jar-free."""

from __future__ import annotations

import io
import json
import warnings
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

import cuplyr_spark.sources.connectors as C
from cuplyr_spark.frame import Frame, broadcast_guarded
from cuplyr_spark.sources.connectors import (
    append_snapshot,
    append_version_as_of,
    read_append_snapshot,
    upsert_append_rows,
    vacuum_append_snapshot,
)
from cuplyr_spark.sources.views import (
    create_append_view,
    read_append_view,
    refresh_append_view,
)


def _mk(spark, rows, schema="g string, x int"):
    return Frame(spark.createDataFrame(rows, schema), ())


# -- ts always explicit in delta records (ADVICE low) ---------------------


def test_log_delta_forces_ts_even_when_unchanged():
    prev = {"version": 3, "segments": ["seg=1-a"], "ts": 111.222,
            "schema": [["x", "int"]]}
    new = dict(prev, version=4, segments=["seg=1-a", "seg=2-b"])
    d = C._log_delta(prev, new)
    assert d is not None and d.get("delta")
    # same-millisecond stamp must not compress away
    assert d["set"]["ts"] == 111.222
    assert C._apply_log_delta(prev, d) == new


def test_same_millisecond_commits_time_travel(spark, tmp_path, monkeypatch):
    tdir = str(tmp_path / "t")
    append_snapshot(_mk(spark, [("a", 1)]), tdir)
    fixed = 1_700_000_000.123
    monkeypatch.setattr("time.time", lambda: fixed)
    append_snapshot(_mk(spark, [("b", 2)]), tdir)
    append_snapshot(_mk(spark, [("c", 3)]), tdir)
    rec2 = C._read_log_rec(C._TableFS(tdir), 2)
    rec3 = C._read_log_rec(C._TableFS(tdir), 3)
    assert rec2.get("delta") and rec3.get("delta")
    assert (rec2.get("set") or {}).get("ts") == fixed
    assert (rec3.get("set") or {}).get("ts") == fixed
    # as_of exactly the shared stamp resolves to the NEWEST such commit
    assert append_version_as_of(tdir, fixed) == 3


# -- 409 is a CAS loss (ADVICE low) ---------------------------------------


def _http_error(code):
    import urllib.error

    return urllib.error.HTTPError(
        "http://store.invalid/k", code, "x", None, io.BytesIO(b"")
    )


def test_conditional_put_409_and_412_are_cas_losses(monkeypatch):
    import urllib.request

    for code in (409, 412):
        monkeypatch.setattr(
            urllib.request, "urlopen",
            lambda req, timeout=None: (_ for _ in ()).throw(_http_error(code)),
        )
        assert C.http_if_none_match_put("http://store.invalid/k", "{}") is False


def test_conditional_put_other_errors_surface(monkeypatch):
    import urllib.error
    import urllib.request

    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda req, timeout=None: (_ for _ in ()).throw(_http_error(503)),
    )
    with pytest.raises(urllib.error.HTTPError):
        C.http_if_none_match_put("http://store.invalid/k", "{}")


# -- vacuum verifies the retention-fold checkpoint (ADVICE medium) --------


def test_vacuum_failed_checkpoint_keeps_chain_alive(spark, tmp_path,
                                                    monkeypatch):
    tdir = str(tmp_path / "t")
    for i in range(5):
        append_snapshot(_mk(spark, [(f"r{i}", i)]), tdir)
    fs = C._TableFS(tdir)
    assert C._read_log_rec(fs, 5).get("delta")
    want = {tuple(r) for r in read_append_snapshot(spark, tdir).df.collect()}

    with monkeypatch.context() as m:
        # a store that rejects every checkpoint write — _write_checkpoint
        # swallows the failure by design, so only the new verification
        # stands between vacuum and a broken chain
        m.setattr(C, "_write_checkpoint", lambda *a, **k: None)
        with pytest.warns(UserWarning, match="did not land"):
            vacuum_append_snapshot(tdir, keep_last=1, orphan_grace_hours=0)
    # the whole delta chain survived: every version still reconstructs
    for v in range(1, 6):
        assert fs.read_text(f"_LOG.{v}") is not None
    got = {tuple(r) for r in read_append_snapshot(spark, tdir).df.collect()}
    assert got == want

    # store recovers: the next vacuum folds the checkpoint and sweeps
    vacuum_append_snapshot(tdir, keep_last=1, orphan_grace_hours=0)
    assert fs.read_text("_CHECKPOINT.5") is not None
    assert fs.read_text("_LOG.1") is None
    got = {tuple(r) for r in read_append_snapshot(spark, tdir).df.collect()}
    assert got == want


# -- persistent checkpoint failure surfaces on read (verdict #5) ----------


def test_long_uncheckpointed_walk_warns_but_stays_correct(
    spark, tmp_path, monkeypatch
):
    tdir = str(tmp_path / "t")
    with monkeypatch.context() as m:
        m.setattr(C, "_write_checkpoint", lambda *a, **k: None)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # appends past v21 warn too
            for i in range(22):
                append_snapshot(_mk(spark, [(f"r{i}", i)]), tdir)
    fs = C._TableFS(tdir)
    C._LOG_STATE_CACHE.clear()  # a FRESH reader pays (and flags) the walk
    with pytest.warns(UserWarning, match="walked"):
        log = C._read_log(fs)
    assert log["version"] == 22 and len(log["segments"]) == 22
    got = {tuple(r) for r in read_append_snapshot(spark, tdir).df.collect()}
    assert got == {(f"r{i}", i) for i in range(22)}


def test_normal_cadence_walk_does_not_warn(spark, tmp_path):
    tdir = str(tmp_path / "t")
    for i in range(12):
        append_snapshot(_mk(spark, [(f"r{i}", i)]), tdir)
    fs = C._TableFS(tdir)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        log = C._read_log(fs)
    assert log["version"] == 12


# -- decimal sum overflow raises instead of silent NULL (ADVICE low) ------


def test_view_decimal_sum_overflow_raises(spark, tmp_path):
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    big = Decimal("9" * 38)  # 10^38 - 1: one more of itself overflows
    mk = lambda v: Frame(
        spark.createDataFrame([("a", v)], "g string, x decimal(38,0)"), ()
    )
    append_snapshot(mk(big), base)
    create_append_view(spark, base, view, "g", {"sx": ("sum", "x")})
    assert read_append_view(spark, view).df.collect()[0]["sx"] == big
    append_snapshot(mk(big), base)
    with pytest.raises(Exception, match="overflow"):
        refresh_append_view(spark, view)


def test_view_decimal_sum_incremental_exact_below_bound(spark, tmp_path):
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    mk = lambda rows: Frame(
        spark.createDataFrame(rows, "g string, x decimal(10,2)"), ()
    )
    append_snapshot(mk([("a", Decimal("1.25")), ("b", None)]), base)
    create_append_view(spark, base, view, "g", {"sx": ("sum", "x")})
    append_snapshot(mk([("a", Decimal("2.50")), ("b", Decimal("0.75"))]), base)
    refresh_append_view(spark, view)
    got = {r["g"]: r["sx"] for r in read_append_view(spark, view).df.collect()}
    assert got == {"a": Decimal("3.75"), "b": Decimal("0.75")}


# -- known_bytes broadcast sizing (verdict #4) -----------------------------


def test_broadcast_guarded_known_bytes_overrides_estimate(spark):
    left = spark.range(1000).toDF("id")
    small = spark.range(10).toDF("id")
    # caller-proven bound over the limit: hint dropped with the warning
    with pytest.warns(UserWarning, match="hint dropped"):
        broadcast_guarded(small, what="t", known_bytes=10**12)
    # caller-proven small bound: hint ships, plan is a broadcast join
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        hinted = broadcast_guarded(small, what="t", known_bytes=260)
    plan = (
        left.join(hinted, "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# -- in-process log-state cache (verdict #2) --------------------------------


def test_log_state_cache_reuses_and_rolls_forward(spark, tmp_path):
    tdir = str(tmp_path / "t")
    for i in range(3):
        append_snapshot(_mk(spark, [(f"r{i}", i)]), tdir)
    fs = C._TableFS(tdir)
    C._LOG_STATE_CACHE.clear()
    s1 = C._read_log(fs)
    assert (fs.dir, 3) in C._LOG_STATE_CACHE
    # second read of the unchanged table: the SAME materialized object
    assert C._read_log(fs) is s1
    # one more commit: the next read rolls one delta onto the cached
    # state instead of re-walking to the base
    append_snapshot(_mk(spark, [("r3", 3)]), tdir)
    s4 = C._read_log(fs)
    assert s4["version"] == 4 and len(s4["segments"]) == 4
    # cached result must equal a cold reconstruction exactly
    C._LOG_STATE_CACHE.clear()
    assert C._read_log(fs) == s4


def test_log_state_cache_never_serves_recreated_table(spark, tmp_path):
    import shutil

    tdir = str(tmp_path / "t")
    for i in range(3):
        append_snapshot(_mk(spark, [(f"old{i}", i)]), tdir)
    fs = C._TableFS(tdir)
    assert C._read_log(fs)["version"] == 3
    # same path, new table, same version numbers — the stat fingerprint
    # of the commit records must invalidate every cached state
    shutil.rmtree(tdir)
    for i in range(3):
        append_snapshot(_mk(spark, [(f"new{i}", 100 + i)]), tdir)
    got = {tuple(r) for r in read_append_snapshot(spark, tdir).df.collect()}
    assert got == {(f"new{i}", 100 + i) for i in range(3)}


def test_log_state_cache_bounded(spark, tmp_path):
    C._LOG_STATE_CACHE.clear()
    tdir = str(tmp_path / "t")
    for i in range(C._LOG_STATE_CACHE_MAX + 4):
        append_snapshot(_mk(spark, [(f"r{i}", i)]), tdir)
    assert len(C._LOG_STATE_CACHE) <= C._LOG_STATE_CACHE_MAX


# -- int-typed partition-range pruning (verdict #3) ------------------------


def test_int_partition_range_typed_ordering(spark, tmp_path):
    """'2' >= '10' in string space but 2 < 10 typed — the digit-count
    boundary is exactly where string comparison silently inverts, so
    the typed compare must win on both sides of it."""
    import shutil
    import os

    d = str(tmp_path / "pint")
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 14).alias("p")
    )
    append_snapshot(
        Frame(df.filter("p < 7"), ()), d, batch_id=0, partition_by="p"
    )
    append_snapshot(Frame(df.filter("p >= 7"), ()), d, batch_id=1)
    log = C._read_log(C._TableFS(d))
    # spy: delete the low-p segment on disk; a typed range that only
    # touches high p must never open it (string space would: '2'>'10')
    low_seg = log["segments"][0]
    shutil.rmtree(os.path.join(d, low_seg))
    out = read_append_snapshot(
        spark, d, partition_filter={"p": (">=", 10)}
    ).collect()
    assert sorted(out["p"].unique().tolist()) == [10, 11, 12, 13]
    assert len(out) == len([i for i in range(40) if i % 14 >= 10])
    # derived form prunes identically
    out2 = read_append_snapshot(spark, d, where="p >= 10").collect()
    assert len(out2) == len(out)


def test_int_partition_range_low_side(spark, tmp_path):
    import shutil
    import os

    d = str(tmp_path / "pint2")
    df = spark.range(40).select(F.col("id"), (F.col("id") % 14).alias("p"))
    append_snapshot(
        Frame(df.filter("p < 7"), ()), d, batch_id=0, partition_by="p"
    )
    append_snapshot(Frame(df.filter("p >= 7"), ()), d, batch_id=1)
    log = C._read_log(C._TableFS(d))
    shutil.rmtree(os.path.join(d, log["segments"][1]))
    # typed '<' keeps only the low segment ('2' < '10' is FALSE in
    # string space — a lexicographic compare would prune the wrong dir)
    out = read_append_snapshot(
        spark, d, partition_filter={"p": ("<", 5)}
    ).collect()
    assert sorted(out["p"].unique().tolist()) == [0, 1, 2, 3, 4]


def test_int_partition_range_refusals():
    # non-int bound on an int column
    with pytest.raises(ValueError, match="int bound"):
        C._normalize_pfilter({"p": (">", "9")}, {"p": "int"})
    with pytest.raises(ValueError, match="int bound"):
        C._normalize_pfilter({"p": (">", 9.5)}, {"p": "bigint"})
    # timestamps still refuse ranges outright
    with pytest.raises(ValueError, match="range condition"):
        C._normalize_pfilter({"t": (">", "2024-01-01")}, {"t": "timestamp"})
    # unparseable directory value under a typed range refuses loudly
    pf = C._normalize_pfilter({"p": (">=", 10)}, {"p": "int"})
    with pytest.raises(ValueError, match="does not parse"):
        C._pf_match({"p": "abc"}, pf)
    # NULL partitions never satisfy a range
    assert C._pf_match({"p": None}, pf) is False
    assert C._pf_match({"p": "10"}, pf) is True
    assert C._pf_match({"p": "9"}, pf) is False


def test_upsert_keyset_broadcast_no_hint_drop(spark, tmp_path):
    """The MERGE probe's key set must broadcast on the strength of the
    exact batch count — no 'hint dropped' warning even when Catalyst's
    estimate of the distinct-over-aggregate side is inflated."""
    tdir = str(tmp_path / "t")
    append_snapshot(
        _mk(spark, [(f"k{i}", i) for i in range(200)]), tdir
    )
    # a derived batch (aggregate → rename) like the view refresh builds
    batch = (
        spark.createDataFrame(
            [(f"k{i}", i, 1.0) for i in range(50)], "g string, x int, w double"
        )
        .groupBy("g").agg(F.max("x").alias("x"))
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        upsert_append_rows(Frame(batch, ()), tdir, key="g")
    drops = [w for w in rec if "hint dropped" in str(w.message)]
    assert not drops, [str(w.message) for w in drops]


def test_int_partition_range_fuzz_soundness(spark, tmp_path):
    """Property: for random typed int bounds, a partition_filter read
    equals the full scan filtered in Spark — pruning may skip work,
    never rows. Crosses the 1/2-digit boundary where string-space
    comparison inverts."""
    import random

    rnd = random.Random(1414)
    d = str(tmp_path / "pfuzz")
    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 23).alias("p")
    )
    append_snapshot(Frame(df.filter("p < 8"), ()), d, batch_id=0,
                    partition_by="p")
    append_snapshot(Frame(df.filter("p >= 8 and p < 16"), ()), d, batch_id=1)
    append_snapshot(Frame(df.filter("p >= 16"), ()), d, batch_id=2)
    full = read_append_snapshot(spark, d).df
    ops = ["<", "<=", ">", ">="]
    for _ in range(12):
        op = rnd.choice(ops)
        v = rnd.randint(-2, 25)
        got = read_append_snapshot(
            spark, d, partition_filter={"p": (op, v)}
        ).collect()
        want = full.filter(f"p {op} {v}").toPandas()
        assert sorted(got["id"].tolist()) == sorted(want["id"].tolist()), (
            op, v
        )
    # two-sided conjunction
    got = read_append_snapshot(
        spark, d, partition_filter={"p": [(">=", 7), ("<", 17)]}
    ).collect()
    want = full.filter("p >= 7 and p < 17").toPandas()
    assert sorted(got["id"].tolist()) == sorted(want["id"].tolist())


# -- column rename / drop (r14, metadata-only schema evolution) -----------


def _ids(pdf):
    return sorted(pdf["id"].tolist())


def test_rename_column_metadata_only_two_eras(spark, tmp_path):
    from cuplyr_spark.sources.connectors import rename_append_column

    d = str(tmp_path / "t")
    mk = lambda lo, name: Frame(
        spark.range(lo, lo + 5).select(
            F.col("id"), (F.col("id") * 10).alias(name)
        ),
        (),
    )
    append_snapshot(mk(0, "amount"), d, batch_id=0)
    append_snapshot(mk(5, "amount"), d, batch_id=1)
    v = rename_append_column(d, "amount", "amt", spark)
    assert v == 3
    # post-rename appends use the new name; old segments translate
    append_snapshot(mk(10, "amt"), d, batch_id=2)
    got = read_append_snapshot(spark, d).collect()
    assert list(got.columns) == ["id", "amt"]
    assert _ids(got) == list(range(15))
    assert sorted(got["amt"].tolist()) == [i * 10 for i in range(15)]
    # predicate on the renamed column: exact across both eras (old
    # segments keep — stats under the old name never prune, residual
    # guards exactness)
    got = read_append_snapshot(spark, d, where="amt >= 20 and amt < 110").collect()
    assert _ids(got) == [2, 3, 4, 5, 6, 7, 8, 9, 10]
    # batch arriving with the OLD name now refuses (retired)
    with pytest.raises(ValueError, match="renamed away|do not match"):
        append_snapshot(mk(99, "amount"), d, batch_id=3)
    with pytest.raises(ValueError, match="renamed away"):
        append_snapshot(mk(99, "amount"), d, batch_id=3, schema_mode="merge")


def test_rename_chain_three_eras_and_rowlevel_writes(spark, tmp_path):
    from cuplyr_spark.sources.connectors import (
        delete_append_rows,
        rename_append_column,
        update_append_rows,
    )

    d = str(tmp_path / "t")
    mk = lambda lo, name: Frame(
        spark.range(lo, lo + 4).select(
            F.col("id"), (F.col("id") + 100).alias(name)
        ),
        (),
    )
    append_snapshot(mk(0, "a"), d, batch_id=0)
    rename_append_column(d, "a", "b", spark)
    append_snapshot(mk(4, "b"), d, batch_id=1)
    rename_append_column(d, "b", "c", spark)
    append_snapshot(mk(8, "c"), d, batch_id=2)
    got = read_append_snapshot(spark, d).collect()
    assert sorted(got["c"].tolist()) == [i + 100 for i in range(12)]
    # row-level delete through the renamed column hits ALL eras
    _, n = delete_append_rows(spark, d, "c >= 102 and c <= 109")
    assert n == 8
    got = read_append_snapshot(spark, d).collect()
    assert sorted(got["c"].tolist()) == [100, 101, 110, 111]
    # keyed update through the head name
    n2, _ = update_append_rows(spark, d, "c = 110", {"c": "c + 1000"})
    got = read_append_snapshot(spark, d).collect()
    assert sorted(got["c"].tolist()) == [100, 101, 111, 1110]


def test_rename_partitioned_nonpartition_column(spark, tmp_path):
    from cuplyr_spark.sources.connectors import rename_append_column

    d = str(tmp_path / "t")
    mk = lambda lo, name: Frame(
        spark.range(lo, lo + 6).select(
            F.col("id"), (F.col("id") % 3).alias("p"),
            (F.col("id") * 2).alias(name),
        ),
        (),
    )
    append_snapshot(mk(0, "v"), d, batch_id=0, partition_by="p")
    rename_append_column(d, "v", "val", spark)
    append_snapshot(mk(6, "val"), d, batch_id=1)
    got = read_append_snapshot(spark, d, partition_filter={"p": 1}).collect()
    assert sorted(got["val"].tolist()) == [2, 8, 14, 20]
    # partition columns refuse renames
    with pytest.raises(ValueError, match="partition column"):
        rename_append_column(d, "p", "part", spark)


def test_drop_column_and_retired_names(spark, tmp_path):
    from cuplyr_spark.sources.connectors import (
        drop_append_column,
        rename_append_column,
    )

    d = str(tmp_path / "t")
    df = spark.range(4).select(
        F.col("id"), (F.col("id") * 2).alias("x"), F.lit("k").alias("y")
    )
    append_snapshot(Frame(df, ()), d, batch_id=0)
    drop_append_column(d, "y", spark)
    got = read_append_snapshot(spark, d).collect()
    assert list(got.columns) == ["id", "x"]
    # re-adding the dropped name refuses (old bytes would resurrect)
    bad = spark.range(4, 6).select(
        F.col("id"), (F.col("id") * 2).alias("x"), F.lit("new").alias("y")
    )
    with pytest.raises(ValueError, match="renamed away or dropped"):
        append_snapshot(Frame(bad, ()), d, batch_id=1, schema_mode="merge")
    # rename target may not collide with live or retired names
    with pytest.raises(ValueError, match="previously renamed away"):
        rename_append_column(d, "x", "y", spark)
    with pytest.raises(ValueError, match="only column"):
        drop_append_column(d, "x", spark)
        drop_append_column(d, "id", spark)


def test_rename_cdf_refusal_and_changes_ok(spark, tmp_path):
    from cuplyr_spark.sources.connectors import (
        read_append_cdf,
        read_append_changes,
        rename_append_column,
    )

    d = str(tmp_path / "t")
    mk = lambda lo, name: Frame(
        spark.range(lo, lo + 3).select(
            F.col("id"), (F.col("id") * 10).alias(name)
        ),
        (),
    )
    append_snapshot(mk(0, "a"), d, batch_id=0)
    rename_append_column(d, "a", "b", spark)
    append_snapshot(mk(3, "b"), d, batch_id=1)
    with pytest.raises(ValueError, match="crosses a column rename"):
        read_append_cdf(spark, d, 1, 3)
    # within one era the typed feed still works
    out = read_append_cdf(spark, d, 2, 3).df.collect()
    assert sorted(r["id"] for r in out) == [3, 4, 5]
    # the raw insert feed handles the crossing window era-aware
    ch = read_append_changes(spark, d, 0, 3).collect()
    assert sorted(ch["b"].tolist()) == [0, 10, 20, 30, 40, 50]


def test_rename_then_compact_and_restore(spark, tmp_path):
    from cuplyr_spark.sources.connectors import (
        compact_append_snapshot,
        rename_append_column,
        restore_append_snapshot,
    )

    d = str(tmp_path / "t")
    mk = lambda lo, name: Frame(
        spark.range(lo, lo + 4).select(
            F.col("id"), (F.col("id") * 10).alias(name)
        ),
        (),
    )
    append_snapshot(mk(0, "a"), d, batch_id=0)
    append_snapshot(mk(4, "a"), d, batch_id=1)
    rename_append_column(d, "a", "b", spark)
    append_snapshot(mk(8, "b"), d, batch_id=2)
    # compaction folds everything into the NEW era
    assert compact_append_snapshot(
        spark, d, target_file_bytes=1, max_live_segments=1
    ) is not None
    got = read_append_snapshot(spark, d).collect()
    assert sorted(got["b"].tolist()) == [i * 10 for i in range(12)]
    # restore to the pre-rename version brings the old schema back
    restore_append_snapshot(spark, d, 2)
    got = read_append_snapshot(spark, d).collect()
    assert list(got.columns) == ["id", "a"]
    assert sorted(got["a"].tolist()) == [i * 10 for i in range(8)]


def test_rename_upsert_through_head_names(spark, tmp_path):
    from cuplyr_spark.sources.connectors import rename_append_column

    d = str(tmp_path / "t")
    mk = lambda rows, name: Frame(
        spark.createDataFrame(rows, f"id long, {name} long"), ()
    )
    append_snapshot(mk([(i, i * 10) for i in range(6)], "a"), d, batch_id=0)
    rename_append_column(d, "a", "b", spark)
    v, replaced, appended = upsert_append_rows(
        mk([(2, 999), (10, 1000)], "b"), d, key="id"
    )
    assert replaced == 1 and appended == 2
    got = read_append_snapshot(spark, d).collect()
    by_id = dict(zip(got["id"], got["b"]))
    assert by_id[2] == 999 and by_id[10] == 1000 and by_id[3] == 30


def test_rename_prune_fuzz_soundness(spark, tmp_path):
    """Property: predicates through a renamed column give identical
    results to the full scan filtered in Spark — stats under the old
    name must degrade to KEEP (never prune wrong), the residual stays
    exact, and post-rename segments still prune."""
    import random

    from cuplyr_spark.sources.connectors import rename_append_column

    rnd = random.Random(1441)
    d = str(tmp_path / "rfuzz")
    mk = lambda lo, n, name: Frame(
        spark.range(lo, lo + n).select(
            F.col("id"), (F.col("id") % 97).cast("double").alias(name)
        ),
        (),
    )
    append_snapshot(mk(0, 60, "v"), d, batch_id=0)
    append_snapshot(mk(60, 60, "v"), d, batch_id=1)
    rename_append_column(d, "v", "val", spark)
    append_snapshot(mk(120, 60, "val"), d, batch_id=2)
    full = read_append_snapshot(spark, d).df
    for _ in range(10):
        op = rnd.choice(["<", "<=", ">", ">=", "=="])
        b = rnd.randint(0, 100)
        pred = f"val {op} {b}"
        got = read_append_snapshot(spark, d, where=pred).collect()
        want = full.filter(pred).toPandas()
        assert sorted(got["id"].tolist()) == sorted(want["id"].tolist()), pred
        # dict stats_filter form too
        got2 = read_append_snapshot(
            spark, d, stats_filter={"val": (op.replace("==", "=="), float(b))}
        ).collect()
        assert sorted(got2["id"].tolist()) == sorted(want["id"].tolist()), pred
