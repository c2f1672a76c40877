"""As-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` (per key).

Spark has no native as-of join (the reference has no joins beyond
equi either, ``README.md:72-78``). Implementation is the fully
distributed union+window formulation, NOT a per-group pandas
merge_asof — no Python boundary, no group-must-fit-in-memory limit:

1. tag left rows (side=1) and right rows (side=0), union by key/ts;
2. one window per key ordered by (ts, side): last_value of the right
   payload with ``ignoreNulls`` carries the most recent right row
   forward onto each left row;
3. filter back to left rows.

Cost: one shuffle of |L| + |R| rows on the key — the same price as a
regular sort-merge join, and it survives arbitrarily large groups
(the window is streaming, no buffering beyond the carried payload).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame


def asof_join(
    left: Frame,
    right: Frame,
    by: str | list[str],
    on: str,
    right_on: str | None = None,
    suffix: str = "_right",
    strict: bool = False,
) -> Frame:
    """Left as-of join.

    Parameters mirror pandas.merge_asof: ``by`` equi-key(s), ``on``
    the left timestamp, ``right_on`` the right timestamp (defaults to
    ``on``), ``strict=True`` uses ``<`` instead of ``<=``.
    """
    keys = [by] if isinstance(by, str) else list(by)
    right_on = right_on or on

    left_df = left.df
    right_df = right.df
    payload_cols = [c for c in right_df.columns if c not in keys and c != right_on]
    # right-side payload lands in suffixed columns to avoid conflicts
    out_names = {
        c: (c + suffix if c in left_df.columns else c) for c in payload_cols
    }

    lhs = left_df.select(
        *[F.col(k) for k in keys],
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left_df.columns]).alias("__lrow"),
        F.lit(None).cast(
            right_df.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
        ).alias("__rrow"),
    )
    rhs = right_df.select(
        *[F.col(k) for k in keys],
        F.col(right_on).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left_df.select(F.struct(*left_df.columns).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*payload_cols).alias("__rrow"),
    )
    # strict: a right row at exactly left.ts must NOT match -> order
    # right rows after left rows at equal ts so last_value skips them.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lhs.unionByName(rhs)
    carried = unioned.withColumn(
        "__matched", F.last(F.col("__rrow"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left_df.columns],
        *[F.col(f"__matched.{c}").alias(out_names[c]) for c in payload_cols],
    )
    return Frame(out, left.group_vars())
