"""State-boundedness regression tests (VERDICT r5 item 5): the
bounded-state claims of the streaming operators are MEASURED here, not
just semantics-tested.

A file-per-microbatch synthetic stream (maxFilesPerTrigger=1 +
availableNow) advances event time batch by batch; per-batch
stateOperators metrics from the query progress show whether state
plateaus at the watermark horizon or grows with the stream.

The full multi-hour run with committed numbers lives in
scripts/scale_rehearsal_streaming.py; this is the small always-on
version that fails CI if a change unbounds the state again.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

from pyspark.sql import functions as F

SCHEMA = "event_id long, user_id long, ts timestamp, value double"

BATCH_MINUTES = 10
ROWS_PER_BATCH = 2_000


def write_batches(path: str, n_batches: int) -> None:
    """One parquet file per microbatch; file i covers event-time
    [i*10min, (i+1)*10min) after a fixed epoch. Filenames sort in
    event-time order, which the file source preserves (listing order),
    so watermarks advance monotonically batch over batch."""
    base = pd.Timestamp("2026-01-01 00:00:00")
    for i in range(n_batches):
        ids = range(i * ROWS_PER_BATCH, (i + 1) * ROWS_PER_BATCH)
        pdf = pd.DataFrame(
            {
                "event_id": list(ids),
                "user_id": [e % 50 for e in ids],
                "ts": [
                    base
                    + pd.Timedelta(minutes=i * BATCH_MINUTES)
                    + pd.Timedelta(seconds=(e * 7) % (BATCH_MINUTES * 60))
                    for e in ids
                ],
                "value": [float(e % 97) for e in ids],
            }
        )
        # pandas defaults to nano INT64 timestamps, which Spark's
        # parquet reader refuses against a `timestamp` schema — write
        # micros explicitly.
        pdf.to_parquet(
            f"{path}/batch_{i:04d}.parquet",
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )


def state_rows_per_batch(spark, src_dir: str, build, name: str) -> list[int]:
    """Run the stream one file per microbatch; return stateOperators
    numRowsTotal per batch."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = build(stream)
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
    rows = []
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else (
            json.loads(p) if isinstance(p, str) else p
        )
        ops = d.get("stateOperators") or []
        if ops:
            rows.append(sum(op["numRowsTotal"] for op in ops))
    return rows


@pytest.mark.parametrize("n_batches", [12])
def test_dedup_within_watermark_state_plateaus(spark, tmp_path, n_batches):
    """dropDuplicatesWithinWatermark on a unique key: unbounded dedup
    state would grow by ROWS_PER_BATCH every batch forever; the
    watermark-bounded operator must plateau at ~horizon/batch_minutes
    batches of keys and stop growing."""
    from cuplyr_spark.streaming.stream import streaming_dedup_within_watermark

    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    write_batches(src, n_batches)

    rows = state_rows_per_batch(
        spark,
        src,
        lambda s: streaming_dedup_within_watermark(
            s, "event_id", "ts", watermark="30 minutes"
        ),
        "dedup_state_test",
    )
    assert len(rows) >= n_batches - 1
    # growth phase: the first batches accumulate state
    assert rows[1] > rows[0]
    # plateau: the watermark is (max event time - 30min), advanced at
    # batch END and applied at the NEXT batch, so state peaks at
    # watermark/batch_minutes + in-flight + eviction-lag = ~7 batches
    # of keys, then stops growing. Measured series (12 batches):
    # 2k,4k,...,14k,14k,14k,14k,14k,14k,12k.
    horizon = 7
    peak = max(rows[:horizon])
    for i, r in enumerate(rows[horizon:], start=horizon):
        assert r <= peak + ROWS_PER_BATCH, (
            f"batch {i}: state {r} rows exceeds plateau {peak} — "
            f"unbounded growth (full series: {rows})"
        )
    # nowhere near the total key count (unbounded would be 24k and
    # climbing with every appended batch)
    assert rows[-1] <= 8 * ROWS_PER_BATCH, rows


@pytest.mark.parametrize("n_batches", [12])
def test_windowed_agg_state_plateaus(spark, tmp_path, n_batches):
    """Watermarked window agg: active (window, key) state must track
    the watermark horizon, not the stream length."""
    from cuplyr_spark.streaming.stream import windowed_agg

    src = str(tmp_path / "srcw")
    import os

    os.makedirs(src)
    write_batches(src, n_batches)

    rows = state_rows_per_batch(
        spark,
        src,
        lambda s: windowed_agg(
            s,
            "ts",
            window="5 minutes",
            watermark="30 minutes",
            group_cols=("user_id",),
            n=F.count(F.lit(1)),
        ),
        "window_state_test",
    )
    assert len(rows) >= n_batches - 1
    horizon = 7
    peak = max(rows[:horizon])
    # active windows: (30min watermark + 10min batch)/5min windows x 50
    # users — must not grow once the horizon is reached
    slack = 2 * 50  # one window per user of eviction lag
    for i, r in enumerate(rows[horizon:], start=horizon):
        assert r <= peak + slack, (
            f"batch {i}: window state {r} exceeds plateau {peak} "
            f"(series: {rows})"
        )
