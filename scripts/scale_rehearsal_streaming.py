"""Streaming state-size rehearsal (VERDICT r5 item 5).

Drives a synthetic multi-hour event stream — 48 file-microbatches, 10
minutes of event time each (8 hours total), 50k events per batch
(2.4M events) — through the bounded-state streaming operators and
records the state store's rows/bytes per batch from the query
progress. The claim under test: state PLATEAUS at the watermark
horizon instead of tracking stream length.

Four queries:
- dedup_bounded:   dropDuplicatesWithinWatermark on a unique key,
                   30 min watermark -> plateau ~= horizon batches.
- dedup_unbounded: plain dropDuplicates (CONTROL) — state grows with
                   every key ever seen; included so the plateau table
                   shows what the watermark buys, not just a flat line.
- window_agg:      5-min windows x 200 users, 30 min watermark.
- join_within:     stream-stream join, keys matching within 10 min,
                   30 min watermarks both sides.

Per-batch metrics come from StreamingQuery.recentProgress
(stateOperators: numRowsTotal, stateMemory/memoryUsedBytes). All four
run with maxFilesPerTrigger=1 + availableNow in one process (state is
KB-scale; the r5 phase-per-process memory lesson applies to shuffle-
heavy 25M-row phases, not here).

Usage: python scripts/scale_rehearsal_streaming.py [n_batches] [rows_per_batch]
Output: one JSON line + a markdown table for BENCH_REFERENCE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cuplyr_spark.session import get_session

SCHEMA = "event_id long, user_id long, ts timestamp, value double"
BATCH_MINUTES = 10
SCRATCH = os.environ.get("REHEARSAL_SCRATCH", "/tmp/rehearsal_streaming")


def write_batches(spark, path: str, n_batches: int, rows_per_batch: int) -> None:
    """One parquet file per microbatch, generated JVM-side. File i
    covers [epoch + i*10min, +10min); lexicographic filenames keep the
    file source's listing order aligned with event time."""
    for i in range(n_batches):
        df = spark.range(i * rows_per_batch, (i + 1) * rows_per_batch).select(
            F.col("id").alias("event_id"),
            F.pmod(F.col("id"), 200).alias("user_id"),
            (
                F.lit("2026-01-01 00:00:00").cast("timestamp")
                + F.make_interval(
                    mins=F.lit(i * BATCH_MINUTES),
                    secs=(F.col("id") * 7 % (BATCH_MINUTES * 60)).cast("double"),
                )
            ).alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{path}/b_{i:04d}")
        # flatten: the file source wants files, not subdirs
        sub = f"{path}/b_{i:04d}"
        part = next(p for p in os.listdir(sub) if p.endswith(".parquet"))
        os.replace(f"{sub}/{part}", f"{path}/batch_{i:04d}.parquet")
        shutil.rmtree(sub)


def run_query(spark, src_dir: str, build, name: str) -> list[dict]:
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = build(stream)
    t0 = time.perf_counter()
    q = (
        out.writeStream.outputMode("append")
        .format("noop")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    sec = time.perf_counter() - t0
    series = []
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else (
            json.loads(p) if isinstance(p, str) else p
        )
        ops = d.get("stateOperators") or []
        if not ops:
            continue
        series.append(
            {
                "batch": d.get("batchId"),
                "rows": sum(op.get("numRowsTotal", 0) for op in ops),
                "bytes": sum(
                    op.get("stateMemory", op.get("memoryUsedBytes", 0))
                    for op in ops
                ),
            }
        )
    return {"sec": round(sec, 1), "series": series}


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rows_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    spark = get_session("rehearsal-streaming")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(n_batches + 10)
    )
    src = f"{SCRATCH}/src"
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(src)
    write_batches(spark, src, n_batches, rows_per_batch)

    from cuplyr_spark.streaming.stream import (
        stream_stream_join,
        streaming_dedup_within_watermark,
        windowed_agg,
    )

    results = {}
    results["dedup_bounded"] = run_query(
        spark, src,
        lambda s: streaming_dedup_within_watermark(
            s, "event_id", "ts", watermark="30 minutes"
        ),
        "dedup_bounded",
    )
    results["dedup_unbounded"] = run_query(
        spark, src, lambda s: s.dropDuplicates(["event_id"]), "dedup_unbounded"
    )
    results["window_agg"] = run_query(
        spark, src,
        lambda s: windowed_agg(
            s, "ts", window="5 minutes", watermark="30 minutes",
            group_cols=("user_id",), n=F.count(F.lit(1)),
            total=F.sum("value"),
        ),
        "window_agg",
    )
    results["join_within"] = run_query(
        spark, src,
        lambda s: stream_stream_join(
            s.withColumnRenamed("value", "lv"),
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumnRenamed("value", "rv")
            .withColumnRenamed("ts", "rts"),
            on="event_id",
            left_ts="ts",
            right_ts="rts",
            within="10 minutes",
            left_watermark="30 minutes",
            right_watermark="30 minutes",
        ),
        "join_within",
    )

    summary = {"n_batches": n_batches, "rows_per_batch": rows_per_batch,
               "event_hours": n_batches * BATCH_MINUTES / 60}
    table = []
    for name, r in results.items():
        rows = [s["rows"] for s in r["series"]]
        bts = [s["bytes"] for s in r["series"]]
        third = max(1, len(rows) // 3)
        early_peak = max(rows[: 2 * third]) if rows else 0
        late_peak = max(rows[-third:]) if rows else 0
        plateaued = late_peak <= early_peak
        summary[name] = {
            "sec": r["sec"],
            "peak_state_rows": max(rows, default=0),
            "final_state_rows": rows[-1] if rows else 0,
            "peak_state_mb": round(max(bts, default=0) / 1e6, 1),
            "plateaued": plateaued,
        }
        table.append((name, r["sec"], max(rows, default=0),
                      rows[-1] if rows else 0,
                      round(max(bts, default=0) / 1e6, 1), plateaued))

    print(json.dumps(summary))
    print()
    print(f"{n_batches * BATCH_MINUTES / 60:g}h event stream, "
          f"{n_batches} batches x {rows_per_batch:,} events, "
          "30 min watermarks:")
    print()
    print("| query | wall s | peak state rows | final state rows | peak state MB | plateaued |")
    print("|---|---|---|---|---|---|")
    for name, sec, pk, fin, mb, pl in table:
        print(f"| {name} | {sec} | {pk:,} | {fin:,} | {mb} | {'yes' if pl else 'NO'} |")

    ok = (
        summary["dedup_bounded"]["plateaued"]
        and summary["window_agg"]["plateaued"]
        and summary["join_within"]["plateaued"]
        and not summary["dedup_unbounded"]["plateaued"]  # control must grow
        and summary["dedup_bounded"]["peak_state_rows"]
        < summary["dedup_unbounded"]["peak_state_rows"] / 3
    )
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
