"""Multi-process concurrency stress for the optimistic-commit layer.

Spawns N INDEPENDENT worker processes (each its own Python + JVM — the
real thing, not threads), all hammering the SAME table with no
coordination beyond the filesystem protocol under test:

- append mode: every worker appends K batches of distinct rows to one
  append/log table (its own app_id). PASS = the final table holds
  exactly N*K*ROWS rows (no lost update, no double-append), the log
  chain is contiguous, and every worker's watermark equals its last
  batch id.
- upsert mode: every worker upserts K batches into one copy-on-write
  table, retrying on ConcurrentWriteError (the documented recovery).
  PASS = the final table equals the union of the last write per key —
  here keys are disjoint per worker, so exactly N*K rows, each with
  its writer's final value.
- mixed mode: append workers PLUS a maintenance worker running tiered
  compaction + vacuum in a loop, skipping on ConcurrentWriteError (a
  scheduled OPTIMIZE pass racing live ingest — the production shape).
  PASS = every appended row present exactly once despite folds
  landing mid-ingest.

Usage: python scripts/stress_concurrent_append.py [append|upsert|mixed] [N] [K]

Measured result (recorded in BENCH_REFERENCE.md): see the
"Concurrent writers" section.
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

ROWS = 50


def _session(tag):
    from cuplyr_spark.session import get_session

    return get_session(app_name=f"stress_{tag}", cpus=2, shuffle_partitions=2)


def append_worker(table, wid, k, out):
    import pandas as pd

    from cuplyr_spark import from_pandas
    from cuplyr_spark.sources.connectors import append_snapshot

    spark = _session(f"a{wid}")
    t0 = time.time()
    for b in range(k):
        pdf = pd.DataFrame(
            {"wid": [wid] * ROWS, "batch": [b] * ROWS, "i": range(ROWS)}
        )
        append_snapshot(
            from_pandas(spark, pdf), table, batch_id=b, app_id=f"w{wid}"
        )
    out.put(("ok", wid, time.time() - t0))


def upsert_worker(table, wid, k, out):
    import pandas as pd

    from cuplyr_spark import ConcurrentWriteError, from_pandas
    from cuplyr_spark.sources.connectors import upsert_snapshot

    spark = _session(f"u{wid}")
    t0 = time.time()
    retries = 0
    for b in range(k):
        pdf = pd.DataFrame(
            {"key": [wid * 1000 + i for i in range(ROWS)],
             "val": [b] * ROWS}
        )
        while True:
            try:
                upsert_snapshot(spark, from_pandas(spark, pdf), table, key="key")
                break
            except ConcurrentWriteError:
                retries += 1
    out.put(("ok", wid, time.time() - t0, retries))


def maintenance_worker(table, wid, n, k, out):
    from cuplyr_spark import ConcurrentWriteError
    from cuplyr_spark.sources.connectors import (
        _log_watermarks,
        _read_log,
        _TableFS,
        compact_append_snapshot,
        vacuum_append_snapshot,
    )

    spark = _session(f"m{wid}")
    t0 = time.time()
    folds = lost = 0
    # keep compacting until every appender's watermark shows its last
    # batch landed (so folds really interleave with live appends),
    # then one final pass
    while time.time() - t0 < 300:
        done = False
        try:
            if compact_append_snapshot(spark, table) is not None:
                folds += 1
            # grace window keeps racing appenders' in-flight segments
            vacuum_append_snapshot(table, keep_last=4, spark=spark)
            log = _read_log(_TableFS(table, spark))
            wms = _log_watermarks(log)
            done = all(wms.get(f"w{w}") == k - 1 for w in range(n))
        except ConcurrentWriteError:
            lost += 1  # an append won the log race mid-fold: skip round
        except FileNotFoundError:
            pass  # table not created yet
        if done:
            break
        time.sleep(0.3)
    out.put(("ok", wid, time.time() - t0, folds, lost))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "append"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    table = tempfile.mkdtemp(prefix=f"stress_{mode}_") + "/t"
    ctx = mp.get_context("spawn")
    out = ctx.Queue()
    target = append_worker if mode in ("append", "mixed") else upsert_worker
    procs = [
        ctx.Process(target=target, args=(table, w, k, out)) for w in range(n)
    ]
    if mode == "mixed":
        procs.append(
            ctx.Process(
                target=maintenance_worker, args=(table, 99, n, k, out)
            )
        )
    t0 = time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join(900)
    # one get per process WITH a timeout: a child's queue item can
    # still be draining through the feeder pipe right after join()
    # returns, so qsize()/get_nowait() under-reads transiently
    results = [out.get(timeout=60) for _ in procs]
    wall = time.time() - t0
    assert len(results) == len(procs) and all(
        r[0] == "ok" for r in results
    ), results

    spark = _session("check")
    if mode in ("append", "mixed"):
        from cuplyr_spark.sources.connectors import (
            _read_log,
            _TableFS,
            read_append_snapshot,
        )

        df = read_append_snapshot(spark, table).df
        total = df.count()
        expect = n * k * ROWS
        per = {
            (r["wid"], r["batch"]): r["n"]
            for r in df.groupBy("wid", "batch").count()
            .withColumnRenamed("count", "n").collect()
        }
        dup_or_lost = {
            key: c for key, c in per.items() if c != ROWS
        }
        log = _read_log(_TableFS(table))
        wms = log.get("watermarks") or {}
        ok = (
            total == expect
            and not dup_or_lost
            and log["version"] >= n * k  # every batch committed a log
            and all(wms.get(f"w{w}") == k - 1 for w in range(n))
        )
        maint = next((r for r in results if r[1] == 99), None)
        print(json.dumps({
            "mode": mode, "workers": n, "batches": k, "rows": total,
            "expected": expect, "log_version": log["version"],
            "watermarks": wms, "bad_cells": len(dup_or_lost),
            "live_segments": len(log["segments"]),
            "folds": maint[3] if maint else None,
            "fold_conflicts_skipped": maint[4] if maint else None,
            "wall_s": round(wall, 1), "pass": ok,
        }))
    else:
        from cuplyr_spark.sources.connectors import read_snapshot

        df = read_snapshot(spark, table).df
        total = df.count()
        expect = n * ROWS
        finals = df.filter(f"val = {k - 1}").count()
        retries = sum(r[3] for r in results)
        ok = total == expect and finals == expect
        print(json.dumps({
            "mode": mode, "workers": n, "batches": k, "rows": total,
            "expected": expect, "final_vals": finals,
            "conflict_retries": retries, "wall_s": round(wall, 1),
            "pass": ok,
        }))
    shutil.rmtree(table, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
