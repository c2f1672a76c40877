"""Model-based fuzz of the deletion-vector lifecycle: a random
sequence of append / delete / update / upsert / compact / vacuum /
RESTORE ops runs against BOTH the real append table and an in-memory
pandas model (model states snapshotted per published version, so a
restore must land exactly on the saved state of its target — or
refuse with FileNotFoundError when vacuum already swept it); after
every op the table must equal the model exactly.

This is the property test commit-protocol code needs: any divergence
between the DV read path (broadcast anti-join, fully-deleted-segment
skip, fold materialization, count additivity) and plain dataframe
semantics surfaces as a row diff with the seed that produced it."""

from __future__ import annotations

import random
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    _TableFS,
    _read_log,
    append_snapshot,
    compact_append_snapshot,
    delete_append_rows,
    merge_append_dvs,
    read_append_snapshot,
    restore_append_snapshot,
    update_append_rows,
    upsert_append_rows,
    vacuum_append_snapshot,
)

N_OPS = 18


def _mkdf(spark, rows):
    return spark.createDataFrame(
        [(int(i), int(g), int(v)) for i, g, v in rows],
        "id long, g long, v long",
    )


def _table_state(spark, d) -> dict[int, tuple[int, int]]:
    return {
        r["id"]: (r["g"], r["v"])
        for r in read_append_snapshot(spark, d).df.collect()
    }


@pytest.mark.parametrize(
    "seed,partitioned,clustered",
    [
        (11, False, False),
        (23, False, False),
        (47, False, False),
        (61, True, False),
        (83, True, False),
        # clustered tables: every op below additionally exercises the
        # file-grain zone maps (write-side range shuffles, per-file
        # stats on every new segment, file-pruned probe scans and
        # reads) against the same in-memory model
        (101, False, True),
        (127, True, True),
    ],
)
def test_dv_lifecycle_matches_model(
    spark, tmp_path, seed, partitioned, clustered
):
    rng = random.Random(seed)
    d = str(tmp_path / f"fuzz{seed}")
    shutil.rmtree(d, ignore_errors=True)
    pby = ["g"] if partitioned else None
    model: dict[int, tuple[int, int]] = {}
    next_id = 0
    batch = 0

    def fresh_rows(n):
        nonlocal next_id
        rows = [
            (i, rng.randrange(5), rng.randrange(1000))
            for i in range(next_id, next_id + n)
        ]
        next_id += n
        return rows

    # the table must exist before row-level ops
    rows = fresh_rows(rng.randrange(20, 60))
    append_snapshot(
        Frame(_mkdf(spark, rows), ()), d, batch_id=batch, partition_by=pby,
        **({"cluster_by": "id", "cluster_files": 3} if clustered else {}),
    )
    batch += 1
    model.update({i: (g, v) for i, g, v in rows})
    # model snapshots per PUBLISHED version: the restore op below must
    # land exactly on the saved state of the version it targets
    fs = _TableFS(d, spark)
    saved = {_read_log(fs)["version"]: dict(model)}

    for step in range(N_OPS):
        op = rng.choice(
            ["append", "delete", "update", "upsert", "compact", "vacuum",
             "merge_dvs", "restore"]
        )
        if op == "append":
            rows = fresh_rows(rng.randrange(5, 40))
            append_snapshot(Frame(_mkdf(spark, rows), ()), d, batch_id=batch)
            batch += 1
            model.update({i: (g, v) for i, g, v in rows})
        elif op == "delete":
            if rng.random() < 0.5:
                lo = rng.randrange(max(next_id, 1))
                hi = lo + rng.randrange(1, 30)
                delete_append_rows(
                    spark, d, {"id": [(">=", lo), ("<", hi)]}
                )
                for i in list(model):
                    if lo <= i < hi:
                        del model[i]
            else:
                m = rng.randrange(2, 7)
                r = rng.randrange(m)
                delete_append_rows(spark, d, f"id % {m} = {r}")
                for i in list(model):
                    if i % m == r:
                        del model[i]
        elif op == "update":
            m = rng.randrange(2, 9)
            r = rng.randrange(m)
            add = rng.randrange(1, 100)
            update_append_rows(
                spark, d, f"g = {r % 5} and id % {m} = {r}",
                {"v": f"v + {add}"},
            )
            for i, (g, v) in model.items():
                if g == r % 5 and i % m == r:
                    model[i] = (g, v + add)
        elif op == "upsert":
            # half existing ids re-keyed values, half brand new
            exist = rng.sample(sorted(model), min(len(model), 8))
            news = fresh_rows(rng.randrange(1, 8))
            rows = [
                (i, rng.randrange(5), rng.randrange(1000)) for i in exist
            ] + news
            upsert_append_rows(Frame(_mkdf(spark, rows), ()), d, key="id")
            model.update({i: (g, v) for i, g, v in rows})
        elif op == "compact":
            compact_append_snapshot(
                spark, d,
                target_file_bytes=rng.choice([1 << 10, 1 << 30]),
                purge_deletes=rng.random() < 0.5,
            )
        elif op == "merge_dvs":
            # DV maintenance is dataChange=false: the model is
            # untouched by construction
            merge_append_dvs(spark, d)
        elif op == "restore":
            cur_v = _read_log(fs)["version"]
            candidates = [k for k in saved if k < cur_v]
            if candidates:
                k = rng.choice(candidates)
                try:
                    restore_append_snapshot(spark, d, k)
                except FileNotFoundError:
                    pass  # vacuumed past the target: documented refusal
                else:
                    model = dict(saved[k])
        else:
            vacuum_append_snapshot(
                d, keep_last=rng.randrange(1, 4), orphan_grace_hours=0
            )
        saved[_read_log(fs)["version"]] = dict(model)
        got = _table_state(spark, d)
        assert got == model, (
            f"seed={seed} step={step} op={op}: table diverged from model "
            f"(missing={sorted(set(model) - set(got))[:5]}, "
            f"extra={sorted(set(got) - set(model))[:5]})"
        )
        if step % 3 == 2:
            # zone-map pruned read under deletes: stats are stale
            # (recorded pre-delete) but pruning must stay SOUND — the
            # filtered read equals the model subset exactly. Alternate
            # the dict form with the string-predicate form (whose
            # conjuncts compile into the same pruning).
            lo = rng.randrange(max(next_id, 1))
            hi = lo + rng.randrange(1, 50)
            if rng.random() < 0.5:
                got_f = read_append_snapshot(
                    spark, d, stats_filter={"id": [(">=", lo), ("<", hi)]}
                )
            else:
                got_f = read_append_snapshot(
                    spark, d, where=f"id >= {lo} and id < {hi}"
                )
            pruned = {
                r["id"]: (r["g"], r["v"]) for r in got_f.df.collect()
            }
            want = {i: gv for i, gv in model.items() if lo <= i < hi}
            assert pruned == want, (
                f"seed={seed} step={step}: stats_filter under deletes "
                f"diverged on [{lo}, {hi})"
            )


@pytest.mark.parametrize("seed", [7, 29])
def test_evolution_lifecycle_matches_model(spark, tmp_path, seed):
    """Model-based fuzz of ADDITIVE SCHEMA EVOLUTION interleaved with
    the row-level lifecycle: the table starts at (id, g, v), evolves to
    carry `w` mid-sequence, and every subsequent append randomly
    includes or omits it; deletes/updates run against BOTH old and new
    columns; compaction folds across the evolution boundary. The table
    must equal the 4-tuple model (None = NULL) after every op."""
    rng = random.Random(seed)
    d = str(tmp_path / f"efuzz{seed}")
    shutil.rmtree(d, ignore_errors=True)
    model: dict[int, tuple[int, int, int | None]] = {}
    next_id = 0
    batch = 0
    evolved = False

    def mk(rows, with_w):
        if with_w:
            return spark.createDataFrame(
                [(int(i), int(g), int(v), w) for i, g, v, w in rows],
                "id long, g long, v long, w long",
            )
        return spark.createDataFrame(
            [(int(i), int(g), int(v)) for i, g, v, _ in rows],
            "id long, g long, v long",
        )

    def fresh(n, with_w):
        nonlocal next_id
        rows = [
            (
                i,
                rng.randrange(5),
                rng.randrange(1000),
                rng.randrange(50) if with_w else None,
            )
            for i in range(next_id, next_id + n)
        ]
        next_id += n
        return rows

    rows = fresh(rng.randrange(20, 40), False)
    append_snapshot(Frame(mk(rows, False), ()), d, batch_id=batch)
    batch += 1
    model.update({r[0]: r[1:] for r in rows})

    for step in range(14):
        op = rng.choice(["append", "delete", "update", "compact", "merge"])
        if op == "append":
            with_w = evolved and rng.random() < 0.7
            grow = not evolved and rng.random() < 0.4
            if grow:
                with_w, evolved = True, True
            rows = fresh(rng.randrange(5, 25), with_w)
            append_snapshot(
                Frame(mk(rows, with_w), ()), d, batch_id=batch,
                schema_mode="merge",
            )
            batch += 1
            model.update({r[0]: r[1:] for r in rows})
        elif op == "delete":
            if evolved and rng.random() < 0.5:
                cut = rng.randrange(50)
                delete_append_rows(spark, d, {"w": (">=", cut)})
                for i in list(model):
                    w = model[i][2]
                    if w is not None and w >= cut:
                        del model[i]
            else:
                m = rng.randrange(2, 7)
                r = rng.randrange(m)
                delete_append_rows(spark, d, f"id % {m} == {r}")
                for i in list(model):
                    if i % m == r:
                        del model[i]
        elif op == "update":
            if evolved and rng.random() < 0.5:
                # backfill w for a slice of old rows
                m = rng.randrange(2, 5)
                r = rng.randrange(m)
                update_append_rows(
                    spark, d, f"id % {m} == {r}", {"w": "v % 50"},
                    schema_mode="merge",
                )
                for i, (g, v, w) in model.items():
                    if i % m == r:
                        model[i] = (g, v, v % 50)
            else:
                add = rng.randrange(1, 100)
                r = rng.randrange(5)
                update_append_rows(spark, d, f"g == {r}", {"v": f"v + {add}"})
                for i, (g, v, w) in model.items():
                    if g == r:
                        model[i] = (g, v + add, w)
        elif op == "compact":
            compact_append_snapshot(
                spark, d,
                target_file_bytes=rng.choice([1 << 10, 1 << 30]),
                purge_deletes=rng.random() < 0.5,
            )
        else:
            merge_append_dvs(spark, d)
        got_df = read_append_snapshot(spark, d).df
        if not evolved:
            got = {
                r["id"]: (r["g"], r["v"], None) for r in got_df.collect()
            }
        else:
            got = {
                r["id"]: (r["g"], r["v"], r["w"]) for r in got_df.collect()
            }
        assert got == model, (
            f"seed={seed} step={step} op={op}: diverged "
            f"(missing={sorted(set(model) - set(got))[:5]}, "
            f"extra={sorted(set(got) - set(model))[:5]}, "
            f"wrong={[i for i in got if i in model and got[i] != model[i]][:5]})"
        )


@pytest.mark.parametrize("seed", [11, 43])
def test_widening_lifecycle_matches_model(spark, tmp_path, seed):
    """Model-based fuzz of TYPE-WIDENING evolution interleaved with the
    row-level lifecycle: the table starts at (id int, g long, v float);
    mid-sequence appends widen id→bigint and v→double (independently,
    at random steps), later batches randomly arrive narrow (upcast) or
    wide; deletes/updates/upserts/compaction run across the widening
    boundaries. Values stay integral (< 2^24) so float/double storage
    is exact and the pure-Python model compares bit-for-bit."""
    import random as _random

    from cuplyr_spark.sources.connectors import upsert_append_rows

    rng = _random.Random(seed)
    d = str(tmp_path / f"wfuzz{seed}")
    shutil.rmtree(d, ignore_errors=True)
    model: dict[int, tuple[int, float]] = {}
    next_id = 0
    batch = 0
    wide_id = False
    wide_v = False

    def mk(rows, wid, wv):
        ddl = (
            f"id {'bigint' if wid else 'int'}, g long, "
            f"v {'double' if wv else 'float'}"
        )
        return spark.createDataFrame(
            [(int(i), int(g), float(v)) for i, g, v in rows], ddl
        )

    def fresh(n):
        nonlocal next_id
        rows = [
            (i, rng.randrange(5), float(rng.randrange(10_000)))
            for i in range(next_id, next_id + n)
        ]
        next_id += n
        return rows

    rows = fresh(rng.randrange(20, 40))
    append_snapshot(Frame(mk(rows, False, False), ()), d, batch_id=batch)
    batch += 1
    model.update({r[0]: (r[1], r[2]) for r in rows})

    for step in range(14):
        op = rng.choice(
            ["append", "delete", "update", "compact", "upsert"]
        )
        if op == "append":
            nonlocal_wid = wide_id or rng.random() < 0.3
            nonlocal_wv = wide_v or rng.random() < 0.3
            wide_id, wide_v = nonlocal_wid, nonlocal_wv
            # batches randomly arrive narrower than the table: upcast
            bw_id = wide_id and rng.random() < 0.8
            bw_v = wide_v and rng.random() < 0.8
            rows = fresh(rng.randrange(5, 25))
            append_snapshot(
                Frame(mk(rows, bw_id, bw_v), ()), d, batch_id=batch,
                schema_mode="merge",
            )
            batch += 1
            model.update({r[0]: (r[1], r[2]) for r in rows})
        elif op == "delete":
            m = rng.randrange(2, 7)
            r = rng.randrange(m)
            delete_append_rows(spark, d, f"id % {m} == {r}")
            for i in list(model):
                if i % m == r:
                    del model[i]
        elif op == "update":
            add = rng.randrange(1, 100)
            r = rng.randrange(5)
            update_append_rows(spark, d, f"g == {r}", {"v": f"v + {add}"})
            for i, (g, v) in model.items():
                if g == r:
                    model[i] = (g, v + add)
        elif op == "upsert":
            live = sorted(model)
            if live:
                picks = rng.sample(live, min(len(live), 4))
                rows = [
                    (i, rng.randrange(5), float(rng.randrange(10_000)))
                    for i in picks
                ]
                upsert_append_rows(
                    Frame(mk(rows, wide_id, wide_v), ()), d, "id",
                    schema_mode="merge",
                )
                model.update({r[0]: (r[1], r[2]) for r in rows})
        else:
            compact_append_snapshot(
                spark, d,
                target_file_bytes=rng.choice([1 << 10, 1 << 30]),
                purge_deletes=rng.random() < 0.5,
            )
        got = {
            r["id"]: (r["g"], float(r["v"]))
            for r in read_append_snapshot(spark, d).df.collect()
        }
        assert got == model, (
            f"seed={seed} step={step} op={op} wide=({wide_id},{wide_v}): "
            f"diverged (missing={sorted(set(model) - set(got))[:5]}, "
            f"extra={sorted(set(got) - set(model))[:5]}, "
            f"wrong={[i for i in got if i in model and got[i] != model[i]][:5]})"
        )
        # derived pruning stays sound across the widening
        if rng.random() < 0.3 and model:
            cut = rng.randrange(10_000)
            want = sorted(i for i, (g, v) in model.items() if v >= cut)
            got_f = sorted(
                r["id"]
                for r in read_append_snapshot(
                    spark, d, where=f"v >= {cut}"
                ).df.collect()
            )
            assert got_f == want, f"seed={seed} step={step}: prune diverged"
