"""Range (interval) join: match left rows whose event time falls in
[start, end] of right-side intervals, plus optional equi-keys.

The naive formulation (`l JOIN r ON l.ts BETWEEN r.start AND r.end`)
has no equi-key for the planner, so Spark executes it as a
BroadcastNestedLoop/cartesian — O(|L|·|R|) and a scale killer. This
operator bucketizes time instead: both sides map to fixed-width
buckets, the right interval explodes to every bucket it overlaps, and
the join becomes a plain EQUI-join on (keys…, bucket) followed by the
exact containment filter. Each (left, right) candidate meets in
exactly the left row's bucket, so no post-join dedup is needed.

Pick ``bucket_ms`` near the typical interval length: much smaller
multiplies the right side's explode factor, much larger widens the
candidate set the filter must discard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

from cuplyr_spark.frame import Frame, _zip_index


def _ms(df: DataFrame, col: str):
    """Column as epoch millis: timestamps (incl. NTZ, for frames not
    built by our reader) converted, numerics taken as
    already-milliseconds."""
    if isinstance(
        df.schema[col].dataType, (TimestampType, TimestampNTZType, DateType)
    ):
        return F.unix_millis(F.col(col).cast("timestamp"))
    return F.col(col).cast("long")


def range_join(
    left: Frame,
    right: Frame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_ms: int = 3_600_000,
    how: str = "inner",
) -> Frame:
    """Join ``left`` rows to ``right`` intervals containing their
    timestamp (inclusive bounds), optionally also matching ``by``
    equi-keys. ``how`` is ``inner`` or ``left`` (unmatched left rows
    kept with nulls).

    Non-key column names must be disjoint between the two sides
    (rename beforehand; the join itself only shares ``by``).
    """
    if bucket_ms < 1:
        raise ValueError("bucket_ms must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    by = list(by or [])
    overlap = set(left.df.columns) & set(right.df.columns) - set(by)
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides — rename first"
        )
    bucket = "__range_bucket"
    lms = "__range_lms"
    rid = "__range_rid"
    ldf = left.df
    if how == "left":
        # row identity for the null-extend step; assigned in parallel
        # (per-partition offsets), never a single-task global window
        ldf = _zip_index(ldf, rid)
    l = ldf.withColumn(lms, _ms(left.df, ts_col)).withColumn(
        bucket, F.floor(F.col(lms) / bucket_ms)
    )
    r = right.df.withColumn(
        bucket,
        F.explode(
            F.sequence(
                F.floor(_ms(right.df, start_col) / bucket_ms),
                F.floor(_ms(right.df, end_col) / bucket_ms),
            )
        ),
    )
    contained = (F.col(lms) >= _ms(right.df, start_col)) & (
        F.col(lms) <= _ms(right.df, end_col)
    )
    matched = l.join(r, on=by + [bucket], how="inner").filter(contained)
    if how == "inner":
        return Frame(matched.drop(bucket, lms), ())
    right_only = [c for c in matched.columns if c not in l.columns]
    out = l.join(matched.select(rid, *right_only), on=rid, how="left")
    return Frame(out.drop(bucket, lms, rid), ())
