"""Dataset statistics / ML-prep operators: feature standardization
and fixed-bin histograms.

Both are two-job shapes at most: a tiny aggregate (per-group moments,
or nothing at all for histograms) broadcast back over a map-only pass.
Nothing here ever shuffles the full input by value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame


def standardize(
    frame: Frame,
    cols: list[str],
    by: list[str] | None = None,
    suffix: str = "_z",
) -> Frame:
    """Z-score standardization: ``(x - mean) / sd`` per column (sample
    sd, NA-excluding), optionally within groups ``by``. Zero-variance
    columns yield NULL z-scores (explicit, rather than ±inf).

    The moments are one tiny aggregate broadcast back onto the data —
    the input itself never shuffles (grouped or not), which is the
    shape that survives a 100 TB feature table.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    keys = list(by or [])
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"__mu_{c}"))
        aggs.append(F.stddev_samp(c).alias(f"__sd_{c}"))
    moments = frame.df.groupBy(*keys).agg(*aggs) if keys else frame.df.agg(*aggs)
    if keys:
        # Null-safe key equality so NULL groups pick up the moments
        # groupBy computed for them (matching window-partition semantics).
        mom = moments
        renames = {k: f"__key_{k}" for k in keys}
        for k, a in renames.items():
            mom = mom.withColumnRenamed(k, a)
        cond = None
        for k, a in renames.items():
            c = frame.df[k].eqNullSafe(mom[a])
            cond = c if cond is None else cond & c
        joined = frame.df.join(F.broadcast(mom), on=cond, how="left").drop(
            *renames.values()
        )
    else:
        joined = frame.df.crossJoin(F.broadcast(moments))
    for c in cols:
        z = F.when(
            F.col(f"__sd_{c}") > 0,
            F.round((F.col(c) - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}"), 6),
        )
        joined = joined.withColumn(c + suffix, z)
    joined = joined.drop(*[f"__mu_{c}" for c in cols], *[f"__sd_{c}" for c in cols])
    return Frame(joined, frame.group_vars())


def histogram(
    frame: Frame,
    col: str,
    bins: int,
    lo: float,
    hi: float,
) -> Frame:
    """Fixed-width histogram over [lo, hi): per-row bucket index via
    floor arithmetic (out-of-range rows clamp to the edge buckets,
    NULLs are dropped), then one partial+final count aggregate —
    map-side combine makes this a single cheap shuffle of ``bins``
    rows per partition at any input size. Empty buckets are absent
    from the output (dense ranges come from joining a sequence).
    """
    if bins < 1 or not hi > lo:
        raise ValueError("need bins >= 1 and hi > lo")
    width = (hi - lo) / bins
    idx = F.floor((F.col(col) - lo) / F.lit(width)).cast("long")
    clamped = F.least(F.greatest(idx, F.lit(0)), F.lit(bins - 1))
    out = (
        frame.df.filter(F.col(col).isNotNull())
        .select(clamped.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("lo", F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6))
        .withColumn("hi", F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6))
    )
    return Frame(out, ())
