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
    # cast("timestamp") is a no-op for TIMESTAMP and normalizes
    # TIMESTAMP_NTZ (unix_micros rejects NTZ; session tz is UTC)
    gap = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
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
        F.unix_millis(F.min(ts_col).cast("timestamp")).alias("start_ms"),
        F.unix_millis(F.max(ts_col).cast("timestamp")).alias("end_ms"),
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


def funnel(
    frame: Frame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> Frame:
    """Strict ordered-funnel analysis: per user, the first time each
    step completed AFTER the previous step (step N counts only if it
    happens later than the user's step N-1 completion).

    One row per user with ``step_1_ts .. step_N_ts`` (null once the
    funnel breaks) and ``stage`` = number of completed steps.

    Single shuffle on the user key: every step's conditional min is a
    window over the same user partition (the cascade references the
    previous step's per-user value row-wise), then one colocated
    per-user aggregate — no per-step job, no re-shuffle between steps.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    df = frame.df
    w = Window.partitionBy(user_col)
    prev: Column | None = None
    names = [f"step_{i + 1}_ts" for i in range(len(steps))]
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & prev.isNotNull() & (F.col(ts_col) > prev)
        df = df.withColumn(names[i], F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(names[i])
    stage = sum((F.col(n).isNotNull()).cast("int") for n in names)
    out = df.groupBy(user_col).agg(
        *[F.min(n).alias(n) for n in names],
        F.min(stage).alias("stage"),
    )
    return Frame(out, ())


def retention_cohorts(
    frame: Frame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> Frame:
    """Classic retention triangle: users grouped into day cohorts by
    first-seen date; for each (cohort_day, day_offset) the number of
    distinct cohort users active that day.

    Two keyed shuffles total: one window over the user key for the
    first-seen date, one hash aggregate over (cohort, offset) after an
    in-partition (user, day) dedup — activity rows never fan out.
    """
    w = Window.partitionBy(user_col)
    day = F.to_date(F.col(ts_col))
    df = (
        frame.df.withColumn("__day", day)
        .withColumn("__cohort", F.min(F.to_date(F.col(ts_col))).over(w))
        .select(
            F.col(user_col),
            F.col("__cohort").alias("cohort_day"),
            F.datediff(F.col("__day"), F.col("__cohort")).alias("day_offset"),
        )
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    return Frame(df, ())


def with_rolling_agg(
    frame: Frame,
    value_col: str,
    key_col: str,
    ts_col: str,
    window_ms: int,
    out_prefix: str = "rolling",
) -> Frame:
    """Trailing time-range aggregate per key: for every event, the sum
    and count of ``value_col`` over the last ``window_ms`` milliseconds
    (inclusive range frame over event-time, equal timestamps are
    peers — the hypertable-style rolling rollup).

    One shuffle on the key; the range frame is evaluated with a single
    in-partition sort, no self-join (the naive ts-between-ts-and-ts-lag
    formulation is O(n²) per key and a scale killer).
    """
    if window_ms < 0:
        raise ValueError("window_ms must be >= 0")
    from cuplyr_spark.operators.asof import _ms_of

    # Same _ms convention as asof/range joins: timestamp/date columns
    # go through unix_millis, numeric columns are already milliseconds.
    m = _ms_of(frame.df, ts_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(m)
        .rangeBetween(-window_ms, Window.currentRow)
    )
    return Frame(
        frame.df.withColumns(
            {
                f"{out_prefix}_sum": F.sum(F.col(value_col)).over(w),
                f"{out_prefix}_n": F.count(F.lit(1)).over(w).cast("long"),
            }
        ),
        frame.group_vars(),
    )


# Gapfill grid steps per bucket unit: date_trunc-valid units mapped to
# the interval that advances the grid by exactly one bucket. 'quarter'
# is a date_trunc unit but NOT an interval unit (-> 3 months); 'week'
# steps 7 days from the Monday date_trunc anchors to. Anything else
# (raw strings, typos) is rejected up front instead of surfacing as an
# opaque Spark interval-parse error.
_GAPFILL_STEPS = {
    "year": "interval 1 year",
    "quarter": "interval 3 month",
    "month": "interval 1 month",
    "week": "interval 7 day",
    "day": "interval 1 day",
    "hour": "interval 1 hour",
    "minute": "interval 1 minute",
    "second": "interval 1 second",
}


def time_bucket_gapfill(
    frame: Frame,
    ts_col: str,
    bucket: str = "hour",
    group_cols: tuple[str, ...] = (),
    fill: dict | None = None,
    bounds="per_group",
    **aggs: Column,
) -> Frame:
    """Tumbling rollup with GAP FILLING — the hypertable
    ``time_bucket_gapfill`` shape: :func:`time_bucket_agg` first, then
    every missing bucket in the series is materialized (``sequence``
    + ``explode`` of the bucket grid — generated, never scanned) and
    the aggregate columns filled per the ``fill`` spec:

    - ``"locf"`` — last observation carried forward (``last`` with
      ``ignorenulls`` over an unbounded-preceding row frame);
    - ``"linear"`` — linear interpolation between the previous and
      next OBSERVED buckets by actual time distance; NULL before the
      first / after the last observation (the Timescale
      ``interpolate`` contract). The result is ``double``;
    - any other value — a constant default (``coalesce``).
    Columns not named in ``fill`` stay NULL on generated rows.

    ``bounds`` picks the grid extent: ``"per_group"`` (default) spans
    each group's own [min, max] observed bucket; ``"global"`` spans
    the whole frame's range for EVERY group (cross join of the
    distinct groups with one broadcast two-timestamp row — aligned
    series for dashboards/tensors); or an explicit ``(start, end)``
    pair of timestamp strings.

    Scale shape: one shuffle for the rollup, one group-keyed window
    pass for the fills. The grid is arithmetic — no data is re-read
    to discover gaps. An UNGROUPED gapfill is a single series (one
    window partition) by construction: bounded by the grid length,
    fine for rollup grains, not a fan-out path."""
    fill = fill or {}
    step_expr = _GAPFILL_STEPS.get(str(bucket).lower())
    if step_expr is None:
        raise ValueError(
            f"time_bucket_gapfill: unsupported bucket {bucket!r} — use "
            f"one of {sorted(_GAPFILL_STEPS)} (the units where the "
            "date_trunc grid and an interval step agree)"
        )
    rolled = time_bucket_agg(frame, ts_col, bucket, tuple(group_cols), **aggs).df
    step = F.expr(step_expr)
    if isinstance(bounds, tuple):
        lo, hi = bounds
        span = rolled.select(*group_cols).distinct().select(
            *group_cols,
            F.lit(lo).cast("timestamp").alias("__lo"),
            F.lit(hi).cast("timestamp").alias("__hi"),
        )
    elif bounds == "per_group" and group_cols:
        span = rolled.groupBy(*group_cols).agg(
            F.min("bucket_start").alias("__lo"),
            F.max("bucket_start").alias("__hi"),
        )
    elif bounds in ("per_group", "global"):
        agg_span = rolled.agg(
            F.min("bucket_start").alias("__lo"),
            F.max("bucket_start").alias("__hi"),
        )
        span = (
            rolled.select(*group_cols).distinct().crossJoin(
                F.broadcast(agg_span)
            )
            if group_cols
            else agg_span
        )
    else:
        raise ValueError(
            f"bounds must be 'per_group', 'global' or a (start, end) "
            f"tuple, got {bounds!r}"
        )
    grid = span.withColumn(
        "bucket_start", F.explode(F.sequence("__lo", "__hi", step))
    ).drop("__lo", "__hi")
    out = grid.join(rolled, on=["bucket_start", *group_cols], how="left")
    if fill:
        unknown = sorted(set(fill) - set(aggs))
        if unknown:
            raise ValueError(
                f"fill names {unknown} are not aggregate columns "
                f"({sorted(aggs)})"
            )
        w = Window.partitionBy(*group_cols).orderBy("bucket_start")
        wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        sec = F.unix_timestamp(F.col("bucket_start")).cast("double")
        for name, how in fill.items():
            c = F.col(name)
            if how == "locf":
                filled = F.last(c, ignorenulls=True).over(wb)
            elif how == "linear":
                pv = F.last(c, ignorenulls=True).over(wb).cast("double")
                pt = F.last(
                    F.when(c.isNotNull(), sec), ignorenulls=True
                ).over(wb)
                nv = F.first(c, ignorenulls=True).over(wf).cast("double")
                nt = F.first(
                    F.when(c.isNotNull(), sec), ignorenulls=True
                ).over(wf)
                filled = (
                    F.when(c.isNotNull(), c.cast("double"))
                    .when(pt.isNull() | nt.isNull(), F.lit(None))
                    .otherwise(pv + (nv - pv) * (sec - pt) / (nt - pt))
                )
            else:
                filled = F.coalesce(c, F.lit(how))
            out = out.withColumn(name, filled)
    cols = ["bucket_start", *group_cols, *aggs]
    return Frame(out.select(*cols), ())
