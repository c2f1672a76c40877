"""As-of join: for each left row, the closest right row per key —
most recent at-or-before (backward, the default), first at-or-after
(forward), or whichever is nearer in time (nearest), with an optional
match tolerance. Parameter surface mirrors ``pandas.merge_asof``.

Spark has no native as-of join (the reference has no joins beyond
equi either, ``README.md:72-78``). Implementation is the fully
distributed union+window formulation, NOT a per-group pandas
merge_asof — no Python boundary, no group-must-fit-in-memory limit:

1. tag left rows (side=1) and right rows (side=0), union by key/ts;
2. one window per key ordered by (ts, side): ``last_value`` of the
   right payload with ``ignoreNulls`` carries the most recent right
   row forward onto each left row (``first_value`` over the following
   frame for the forward direction; both for nearest);
3. filter back to left rows.

Cost: one shuffle of |L| + |R| rows on the key — the same price as a
regular sort-merge join, and it survives arbitrarily large groups
(the window is streaming, no buffering beyond the carried payload).
``nearest`` adds a second in-partition sort (opposite equal-ts
ordering), still zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

from cuplyr_spark.frame import Frame


def _ms_of(df: DataFrame, col: str) -> Column:
    # TIMESTAMP_NTZ is included defensively: the engine's reader
    # normalizes it away, but frames built elsewhere (createDataFrame
    # from naive pandas timestamps) still reach this operator.
    if isinstance(
        df.schema[col].dataType, (TimestampType, TimestampNTZType, DateType)
    ):
        return F.unix_millis(F.col(col).cast("timestamp"))
    return F.col(col).cast("long")


def asof_join(
    left: Frame,
    right: Frame,
    by: str | list[str],
    on: str,
    right_on: str | None = None,
    suffix: str = "_right",
    strict: bool = False,
    direction: str = "backward",
    tolerance_ms: int | None = None,
) -> Frame:
    """Left as-of join.

    Parameters mirror pandas.merge_asof: ``by`` equi-key(s), ``on``
    the left timestamp, ``right_on`` the right timestamp (defaults to
    ``on``), ``strict=True`` uses ``<``/``>`` instead of ``<=``/``>=``,
    ``direction`` in {backward, forward, nearest} (nearest breaks
    exact-gap ties backward, like pandas), ``tolerance_ms`` nulls out
    matches farther than the given gap in epoch milliseconds.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward'|'forward'|'nearest'")
    if tolerance_ms is not None and tolerance_ms < 0:
        raise ValueError("tolerance_ms must be >= 0")
    keys = [by] if isinstance(by, str) else list(by)
    right_on = right_on or on

    left_df = left.df
    right_df = right.df
    payload_cols = [c for c in right_df.columns if c not in keys and c != right_on]
    # right-side payload lands in suffixed columns to avoid conflicts
    out_names = {
        c: (c + suffix if c in left_df.columns else c) for c in payload_cols
    }
    # the right event time rides along (as epoch ms) for tolerance /
    # nearest gap math, then is dropped from the output
    rts = "__rts"
    rpay = F.struct(
        *[F.col(c) for c in payload_cols], _ms_of(right_df, right_on).alias(rts)
    )
    rpay_type = right_df.select(rpay.alias("s")).schema["s"].dataType

    lhs = left_df.select(
        *[F.col(k) for k in keys],
        F.col(on).alias("__ts"),
        _ms_of(left_df, on).alias("__ms"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left_df.columns]).alias("__lrow"),
        F.lit(None).cast(rpay_type).alias("__rrow"),
    )
    rhs = right_df.select(
        *[F.col(k) for k in keys],
        F.col(right_on).alias("__ts"),
        _ms_of(right_df, right_on).alias("__ms"),
        F.lit(0).alias("__side"),
        F.lit(None)
        .cast(left_df.select(F.struct(*left_df.columns).alias("s")).schema["s"].dataType)
        .alias("__lrow"),
        rpay.alias("__rrow"),
    )
    unioned = lhs.unionByName(rhs)

    # Equal-ts handling is encoded in the per-direction sort: a right
    # row at exactly left.ts must be INSIDE the frame for non-strict
    # and OUTSIDE it for strict.
    #   backward (frame = preceding..current): right-before-left
    #     includes it (side asc), left-before-right excludes (desc).
    #   forward (frame = current..following): left-before-right
    #     includes it (side desc), right-before-left excludes (asc).
    back_side = F.col("__side").asc() if not strict else F.col("__side").desc()
    fwd_side = F.col("__side").desc() if not strict else F.col("__side").asc()
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), back_side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), fwd_side)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def within_tol(match: Column, gap: Column) -> Column:
        ok = match.isNotNull()
        if tolerance_ms is not None:
            ok = ok & (gap <= tolerance_ms)
        return F.when(ok, match)

    if direction == "backward":
        m = F.last(F.col("__rrow"), ignorenulls=True).over(wb)
        matched = within_tol(m, F.col("__ms") - m[rts])
    elif direction == "forward":
        m = F.first(F.col("__rrow"), ignorenulls=True).over(wf)
        matched = within_tol(m, m[rts] - F.col("__ms"))
    else:  # nearest: smaller gap wins, exact ties go backward
        b = F.last(F.col("__rrow"), ignorenulls=True).over(wb)
        f = F.first(F.col("__rrow"), ignorenulls=True).over(wf)
        bv = within_tol(b, F.col("__ms") - b[rts])
        fv = within_tol(f, f[rts] - F.col("__ms"))
        bgap = F.col("__ms") - bv[rts]
        fgap = fv[rts] - F.col("__ms")
        matched = (
            F.when(fv.isNull(), bv)
            .when(bv.isNull(), fv)
            .when(bgap <= fgap, bv)
            .otherwise(fv)
        )

    carried = unioned.withColumn("__matched", matched)
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left_df.columns],
        *[F.col(f"__matched.{c}").alias(out_names[c]) for c in payload_cols],
    )
    return Frame(out, left.group_vars())
