"""Multi-process concurrency stress for the ROW-LEVEL write paths
(deletion vectors): N independent worker processes (each its own
Python + JVM) hammer ONE append table with interleaved appends,
deletes, and keyed upserts — while an optional maintenance process
runs purge-compaction + DV-merge maintenance + vacuum in a loop. No
coordination beyond the filesystem commit protocol under test.

By default worker 0 also EVOLVES the schema mid-stress (its batches
from b>=1 carry an extra `w` column via schema_mode="merge" while
every other writer keeps appending without it) — the rebase rules
under test then include concurrent additive evolution: grown schemas
must survive interleaved publishes, and pre-evolution rows must read
w=NULL exactly. Pass --no-evolve for the fixed-schema variant.

Each worker owns a disjoint id range, so the expected FINAL state is
exactly computable regardless of interleaving:

  per worker w, batch b over rows [lo, lo+R):
    - append rows with val=b
    - delete its rows where id % 10 < 3      (retry on conflict)
    - upsert rows [lo, lo+5) with val=b+1000 (re-inserts any of those
      five the delete removed — MERGE insert-on-miss)

  expected(id) = b+1000 if id in the upsert window
                 absent if id % 10 < 3 (outside the window)
                 b      otherwise

PASS = the final table equals that dict exactly: no lost update, no
resurrected delete, no double row — despite folds landing mid-write
(which force delete/upsert rebases and ConcurrentWriteError retries,
the documented recovery).

Usage: python scripts/stress_concurrent_deletes.py [N] [K] [--no-maint]
       [--clustered]  (key-clustered table: every write path adds the
                       range shuffle + per-file zone maps under race)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # spawn'd workers re-import this module bare
    sys.path.insert(0, REPO)

ROWS = 40
UPS = 5  # upsert window size at the head of each batch's range


def _session(tag):
    from cuplyr_spark.session import get_session

    return get_session(app_name=f"dvstress_{tag}", cpus=2, shuffle_partitions=2)


def _retry(fn):
    from cuplyr_spark import ConcurrentWriteError

    n = 0
    while True:
        try:
            return fn(), n
        except ConcurrentWriteError:
            n += 1
            time.sleep(0.05)


def rowlevel_worker(table, wid, k, out, evolve=True, clustered=False):
    import pandas as pd

    from cuplyr_spark import from_pandas
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.sources.connectors import (
        append_snapshot,
        delete_append_rows,
        upsert_append_rows,
    )

    spark = _session(f"w{wid}")
    t0 = time.time()
    retries = 0
    base = wid * 1_000_000
    mode = "merge" if evolve else "strict"
    for b in range(k):
        lo = base + b * ROWS
        pdf = pd.DataFrame(
            {"id": range(lo, lo + ROWS), "val": [b] * ROWS}
        )
        if evolve and wid == 0 and b >= 1:
            pdf["w"] = [b] * ROWS  # worker 0 evolves the schema live
        # clustered mode: every writer names the SAME spec, so the
        # first-append race resolves to an identical layout on rebase
        # and every later append validates against the table's
        ckw = (
            {"cluster_by": ["id"], "cluster_files": 2} if clustered else {}
        )
        _, r0 = _retry(
            lambda: append_snapshot(
                from_pandas(spark, pdf), table, batch_id=b,
                app_id=f"w{wid}", schema_mode=mode, **ckw,
            )
        )
        _, r1 = _retry(
            lambda: delete_append_rows(
                spark, table,
                {"id": [(">=", lo), ("<", lo + ROWS)]},
                residual="id % 10 < 3",
            )
        )
        ups = pd.DataFrame(
            {"id": range(lo, lo + UPS), "val": [b + 1000] * UPS}
        )
        _, r2 = _retry(
            lambda: upsert_append_rows(
                from_pandas(spark, ups), table, key="id",
                schema_mode=mode,
            )
        )
        retries += r0 + r1 + r2
    out.put(("ok", wid, time.time() - t0, retries))


def maintenance_worker(table, done_flag, out):
    from cuplyr_spark import ConcurrentWriteError
    from cuplyr_spark.sources.connectors import (
        compact_append_snapshot,
        merge_append_dvs,
        vacuum_append_snapshot,
    )

    spark = _session("maint")
    t0 = time.time()
    folds = lost = 0
    while time.time() - t0 < 600:
        finishing = os.path.exists(done_flag)
        try:
            if merge_append_dvs(spark, table) is not None:
                folds += 1  # DV maintenance counts as a fold too
            if compact_append_snapshot(
                spark, table, purge_deletes=True, shuffle=True
            ) is not None:
                folds += 1
            vacuum_append_snapshot(table, keep_last=6, spark=spark)
        except ConcurrentWriteError:
            lost += 1  # a live writer won the log race mid-fold/merge
        except FileNotFoundError:
            pass  # table not created yet
        if finishing:
            break
        time.sleep(0.2)
    out.put(("ok", 99, time.time() - t0, folds, lost))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    maint = "--no-maint" not in sys.argv
    evolve = "--no-evolve" not in sys.argv
    clustered = "--clustered" in sys.argv
    root = tempfile.mkdtemp(prefix="dvstress_")
    table = root + "/t"
    done_flag = root + "/_STRESS_DONE"
    ctx = mp.get_context("spawn")
    out = ctx.Queue()
    procs = [
        ctx.Process(
            target=rowlevel_worker, args=(table, w, k, out, evolve, clustered)
        )
        for w in range(n)
    ]
    if maint:
        procs.append(
            ctx.Process(
                target=maintenance_worker, args=(table, done_flag, out)
            )
        )
    t0 = time.time()
    for p in procs:
        p.start()
    # workers first; then signal the maintenance loop to finish
    for p in procs[:n]:
        p.join(900)
    open(done_flag, "w").write("done")
    for p in procs[n:]:
        p.join(900)
    # generous timeout: N+1 cold JVMs starting at once can leave the
    # slowest worker's queue put racing a short get (observed once)
    results = [out.get(timeout=300) for _ in procs]
    wall = time.time() - t0
    assert len(results) == len(procs) and all(
        r[0] == "ok" for r in results
    ), results

    expected = {}
    for w in range(n):
        base = w * 1_000_000
        for b in range(k):
            lo = base + b * ROWS
            # worker 0's batches b>=1 carry w=b; upserted rows are
            # replaced by (id, val)-only batches, so their w is NULL
            w_val = b if (evolve and w == 0 and b >= 1) else None
            for i in range(lo, lo + ROWS):
                if i < lo + UPS:
                    expected[i] = (b + 1000, None)
                elif i % 10 < 3:
                    pass  # deleted
                else:
                    expected[i] = (b, w_val)

    spark = _session("check")
    from cuplyr_spark.sources.connectors import read_append_snapshot

    final = read_append_snapshot(spark, table).df
    if evolve and "w" not in final.columns:
        raise AssertionError("schema evolution lost: no w column")
    got = {
        r["id"]: (r["val"], r["w"] if evolve else None)
        for r in final.collect()
    }
    missing = sorted(set(expected) - set(got))[:5]
    extra = sorted(set(got) - set(expected))[:5]
    wrong = sorted(
        i for i in set(got) & set(expected) if got[i] != expected[i]
    )[:5]
    ok = not missing and not extra and not wrong
    m = next((r for r in results if r[1] == 99), None)
    if clustered:
        # every live raw segment of a clustered table must carry file
        # stats (folds recompute theirs; orphaned entries never linger)
        from cuplyr_spark.sources.connectors import _TableFS, _read_log

        log = _read_log(_TableFS(table, spark))
        assert log.get("cluster_by") == ["id"], log.get("cluster_by")
        fsm = log.get("file_stats") or {}
        uncovered = [s2 for s2 in log["segments"] if s2 not in fsm]
        assert not uncovered, f"segments without file stats: {uncovered}"
    print(json.dumps({
        "workers": n, "batches": k, "clustered": clustered, "rows": len(got),
        "expected_rows": len(expected),
        "worker_retries": sum(r[3] for r in results if r[1] != 99),
        "folds": m[3] if m else None,
        "fold_conflicts_skipped": m[4] if m else None,
        "missing": missing, "extra": extra, "wrong_val": wrong,
        "wall_s": round(wall, 1), "pass": ok,
    }))
    shutil.rmtree(root, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
