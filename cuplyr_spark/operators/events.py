"""Event-stream (batch) operators: sessionization, running aggregates,
time-bucketed rollups.

The reference has no temporal operators at all (SURVEY §2.10); these
are the batch halves of the streaming surface (streaming/ has the
structured-streaming versions). All are single-shuffle window designs:
partition by the entity key, order by event time — the 100 TB shape,
since each user's history lands on one executor and everything else
pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame


def with_running_sum(
    frame: Frame,
    value_col: str,
    key_col: str,
    ts_col: str,
    *order_tiebreak: str,
    out_col: str = "running_sum",
) -> Frame:
    """Cumulative sum per key in event-time order (one shuffle on key)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), *[F.col(c).asc() for c in order_tiebreak])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return Frame(
        frame.df.withColumn(out_col, F.sum(value_col).over(w)), frame.group_vars()
    )


def sessionize(
    frame: Frame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> Frame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event (same key) exceeds ``gap_seconds``.

    lag + cumulative-sum over one keyed window — the classic Spark
    formulation; a single shuffle on the key, no UDF, no state store
    (streaming/ has the stateful version via session_window)."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    out = frame.df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return Frame(out, frame.group_vars())


def session_stats(
    frame: Frame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> Frame:
    """Sessionize + per-session rollup (n events, start/end, duration)."""
    s = sessionize(frame, key_col, ts_col, gap_seconds)
    out = s.df.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_millis(F.min(ts_col)).alias("start_ms"),
        F.unix_millis(F.max(ts_col)).alias("end_ms"),
    )
    return Frame(
        out.withColumn("duration_ms", F.col("end_ms") - F.col("start_ms")), ()
    )


def time_bucket_agg(
    frame: Frame,
    ts_col: str,
    bucket: str = "hour",
    group_cols: tuple[str, ...] = (),
    **aggs: Column,
) -> Frame:
    """Tumbling-window rollup via date_trunc (hypertable-rollup shape:
    one shuffle on (bucket, groups), partial aggregation map-side)."""
    out = (
        frame.df.withColumn("bucket_start", F.date_trunc(bucket, F.col(ts_col)))
        .groupBy("bucket_start", *group_cols)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    return Frame(out, ())
