"""Model-based fuzz of the deletion-vector lifecycle: a random
sequence of append / delete / update / upsert / compact / vacuum ops
runs against BOTH the real append table and an in-memory pandas model;
after every op the table must equal the model exactly.

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
    append_snapshot,
    compact_append_snapshot,
    delete_append_rows,
    read_append_snapshot,
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
    "seed,partitioned",
    [(11, False), (23, False), (47, False), (61, True), (83, True)],
)
def test_dv_lifecycle_matches_model(spark, tmp_path, seed, partitioned):
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
        Frame(_mkdf(spark, rows), ()), d, batch_id=batch, partition_by=pby
    )
    batch += 1
    model.update({i: (g, v) for i, g, v in rows})

    for step in range(N_OPS):
        op = rng.choice(
            ["append", "delete", "update", "upsert", "compact", "vacuum"]
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
        else:
            vacuum_append_snapshot(
                d, keep_last=rng.randrange(1, 4), orphan_grace_hours=0
            )
        got = _table_state(spark, d)
        assert got == model, (
            f"seed={seed} step={step} op={op}: table diverged from model "
            f"(missing={sorted(set(model) - set(got))[:5]}, "
            f"extra={sorted(set(got) - set(model))[:5]})"
        )
        if step % 3 == 2:
            # zone-map pruned read under deletes: stats are stale
            # (recorded pre-delete) but pruning must stay SOUND — the
            # filtered read equals the model subset exactly
            lo = rng.randrange(max(next_id, 1))
            hi = lo + rng.randrange(1, 50)
            pruned = {
                r["id"]: (r["g"], r["v"])
                for r in read_append_snapshot(
                    spark, d, stats_filter={"id": [(">=", lo), ("<", hi)]}
                ).df.collect()
            }
            want = {i: gv for i, gv in model.items() if lo <= i < hi}
            assert pruned == want, (
                f"seed={seed} step={step}: stats_filter under deletes "
                f"diverged on [{lo}, {hi})"
            )
