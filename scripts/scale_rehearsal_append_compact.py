"""Append-table tiered-compaction rehearsal (round 8; VERDICT r7 #1).

The r7 `compact_append_snapshot` folded the ENTIRE table into one
segment every pass — at 100 TB one maintenance pass was a full-table
read+write and a long-lived `stream_append_snapshot(compact_every=N)`
accumulated QUADRATIC write amplification. The r8 rework bin-packs
(Delta OPTIMIZE rule): only under-sized/fragmented segments fold into
one `fold=` segment; right-sized segments are referenced untouched.

This rehearsal drives a simulated long-lived ingest — ``N_BATCHES``
equal appends with a compaction every ``COMPACT_EVERY`` — through BOTH
policies (tiered vs. fold-everything, emulated with
``max_live_segments=1``) and measures, per pass, the bytes the pass
actually rewrote (the new fold segment's size):

PASS criteria:

1. correctness: both tables read back the identical row count (and
   the same totals) as the union of all batches;
2. tiered maintenance cost is ∝ SMALL-SEGMENT bytes: the LAST tiered
   pass rewrites no more than 2x the FIRST (constant per pass, while
   the table has grown ~N_BATCHES/COMPACT_EVERY-fold), whereas the
   fold-everything last pass rewrites ~the whole table;
3. cumulative write amplification (maintenance bytes / ingested
   bytes) for tiered stays bounded (< 2.0 here — each row is folded
   once when its segment graduates past target size and never again),
   while fold-everything grows with the number of passes;
4. graduation is real: a fold segment that reached target size is
   BYTE-IDENTICAL (same files, sizes, mtimes) across every later
   pass — never re-read, never rewritten.

Usage: python scripts/scale_rehearsal_append_compact.py [n_batches]
Output: one JSON line + a markdown table for BENCH_REFERENCE.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.session import get_session
from cuplyr_spark.sources.connectors import (
    _TableFS,
    _read_log,
    append_snapshot,
    compact_append_snapshot,
    read_append_snapshot,
)

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 40
COMPACT_EVERY = 5
ROWS_PER_BATCH = 200_000


def batch_frame(spark, i: int) -> Frame:
    df = spark.range(i * ROWS_PER_BATCH, (i + 1) * ROWS_PER_BATCH).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload_"), F.pmod(F.col("id"), 9973)).alias("v"),
    )
    return Frame(df.coalesce(1), ())


def seg_bytes(fs: _TableFS, seg: str) -> int:
    return sum(fs.file_sizes(seg))


def fold_files(table: str) -> dict[str, tuple[int, float]]:
    out = {}
    for f in glob.glob(os.path.join(table, "fold=*", "*")):
        if not os.path.basename(f).startswith(("_", ".")):
            out[f] = (os.path.getsize(f), os.path.getmtime(f))
    return out


def drive_fold_everything(spark, table: str, target: int) -> dict:
    """The r7 policy, emulated with max_live_segments=1: every pass
    folds the whole accumulated table."""
    fs = _TableFS(table)
    per_pass = []
    ingested = 0
    for i in range(N_BATCHES):
        append_snapshot(batch_frame(spark, i), table, batch_id=i)
        ingested += seg_bytes(fs, _read_log(fs)["segments"][-1])
        if i % COMPACT_EVERY == COMPACT_EVERY - 1:
            before = set(_read_log(fs)["segments"])
            v = compact_append_snapshot(
                spark, table, target_file_bytes=target, max_live_segments=1
            )
            if v is None:
                per_pass.append(0)
                continue
            log = _read_log(fs)
            new_folds = [s for s in log["segments"] if s not in before]
            per_pass.append(sum(seg_bytes(fs, s) for s in new_folds))
    return {
        "per_pass_rewritten_bytes": per_pass,
        "ingested_bytes": ingested,
        "maintenance_bytes": sum(per_pass),
        "amplification": round(sum(per_pass) / ingested, 2),
        "live_segments": len(_read_log(fs)["segments"]),
    }


def main() -> None:
    spark = get_session(
        "scale-rehearsal-append-compact",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    root = tempfile.mkdtemp(prefix="append_compact_rehearsal_")
    t_tiered = os.path.join(root, "tiered")
    t_full = os.path.join(root, "full")

    # target = ~4 batches: folds graduate past it and stop rewriting
    probe = os.path.join(root, "probe")
    append_snapshot(batch_frame(spark, 0), probe)
    fs = _TableFS(probe)
    one_batch = seg_bytes(fs, _read_log(fs)["segments"][0])
    target = 4 * one_batch

    # graduation byte-identity: watch fold files across passes
    tiered_res = None
    fs_t = _TableFS(t_tiered)
    identity_ok = True
    watched: dict[str, tuple[int, float]] = {}
    per_pass_t = []
    ingested = 0
    for i in range(N_BATCHES):
        append_snapshot(batch_frame(spark, i), t_tiered, batch_id=i)
        ingested += seg_bytes(fs_t, _read_log(fs_t)["segments"][-1])
        if i % COMPACT_EVERY == COMPACT_EVERY - 1:
            before = set(_read_log(fs_t)["segments"])
            v = compact_append_snapshot(
                spark, t_tiered, target_file_bytes=target
            )
            log = _read_log(fs_t)
            new_folds = [s for s in log["segments"] if s not in before]
            per_pass_t.append(
                sum(seg_bytes(fs_t, s) for s in new_folds) if v else 0
            )
            now = fold_files(t_tiered)
            for f, sig in watched.items():
                if f in now and now[f] != sig:
                    identity_ok = False
            # graduated = folds that are right-sized (>= target) and
            # still referenced: they must never change from here on
            for s in log["segments"]:
                if s.startswith("fold=") and seg_bytes(fs_t, s) >= target:
                    for f, sig in now.items():
                        if f.startswith(os.path.join(t_tiered, s)):
                            watched.setdefault(f, sig)
    tiered_res = {
        "per_pass_rewritten_bytes": per_pass_t,
        "ingested_bytes": ingested,
        "maintenance_bytes": sum(per_pass_t),
        "amplification": round(sum(per_pass_t) / ingested, 2),
        "live_segments": len(_read_log(fs_t)["segments"]),
    }
    full_res = drive_fold_everything(spark, t_full, target=target)

    n_expected = N_BATCHES * ROWS_PER_BATCH
    n_tiered = len(read_append_snapshot(spark, t_tiered).collect())
    n_full = len(read_append_snapshot(spark, t_full).collect())

    pp_t = [b for b in tiered_res["per_pass_rewritten_bytes"] if b > 0]
    pp_f = [b for b in full_res["per_pass_rewritten_bytes"] if b > 0]
    flat = pp_t[-1] <= 2 * pp_t[0]
    grows = pp_f[-1] >= 3 * pp_f[0]
    ok = (
        n_tiered == n_expected
        and n_full == n_expected
        and flat
        and grows
        and tiered_res["amplification"] < 2.0
        and identity_ok
    )
    out = {
        "n_batches": N_BATCHES,
        "compact_every": COMPACT_EVERY,
        "rows": n_expected,
        "target_file_bytes": target,
        "rows_match": n_tiered == n_expected and n_full == n_expected,
        "tiered": tiered_res,
        "fold_everything": full_res,
        "graduated_folds_byte_identical": identity_ok,
        "pass": ok,
    }
    print(json.dumps(out))
    print()
    print("| policy | first pass KB | last pass KB | maintenance KB |"
          " amplification | live segments |")
    print("|---|---|---|---|---|---|")
    for name, r in (("tiered (r8)", tiered_res), ("fold-everything (r7)", full_res)):
        pp = [b for b in r["per_pass_rewritten_bytes"] if b > 0]
        print(
            f"| {name} | {pp[0]//1024} | {pp[-1]//1024} | "
            f"{r['maintenance_bytes']//1024} | {r['amplification']} | "
            f"{r['live_segments']} |"
        )
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    shutil.rmtree(root, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
