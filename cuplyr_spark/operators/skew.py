"""Skew-resistant aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (null user ids, default buckets, bot
traffic) can put one shuffle partition orders of magnitude above the
rest. AQE's skew-join handling covers joins; for AGGREGATION over
associative functions the classic fix is salting:

  phase 1: group by (key, salt) with salt = crc32(row-id-ish) % n —
           hot keys split across n partial groups, shuffle evens out;
  phase 2: re-aggregate partials by key (n rows per key, trivial).

Only associative/decomposable aggregates qualify (sum, count, min,
max; mean as sum/count) — the API is explicit about that rather than
accepting arbitrary expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame

# agg name -> (phase1 fn, phase2 fn over partials)
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_summarise(
    frame: Frame,
    keys: list[str],
    n_salts: int = 16,
    **aggs: tuple[str, str | None],
) -> Frame:
    """Two-phase aggregation with a salt on the first shuffle.

    ``aggs`` maps output name -> (fn, col) with fn in
    {sum, count, min, max, mean}; col is None for count.

    Example::

        salted_summarise(t, ["user_id"], n_salts=32,
                         total=("sum", "value"), n=("count", None),
                         avg=("mean", "value"))
    """
    salt = (F.crc32(F.concat_ws("§", *[F.col(k).cast("string") for k in keys],
                                F.monotonically_increasing_id().cast("string")))
            % n_salts).alias("__salt")

    phase1_cols: list[Column] = []
    phase2_cols: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "mean":
            phase1_cols.append(F.sum(col).alias(f"__s_{name}"))
            phase1_cols.append(F.count(col).alias(f"__c_{name}"))
            phase2_cols.append(
                (F.sum(f"__s_{name}") / F.sum(f"__c_{name}")).alias(name)
            )
            continue
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"salted_summarise supports {sorted(_DECOMPOSABLE)} + mean, got {fn!r}"
            )
        p1, p2 = _DECOMPOSABLE[fn]
        phase1_cols.append(p1(col).alias(f"__p_{name}"))
        phase2_cols.append(p2(f"__p_{name}").alias(name))

    partial = (
        frame.df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*phase1_cols)
    )
    out = partial.groupBy(*keys).agg(*phase2_cols)
    return Frame(out, ())


def salted_join(
    left: Frame,
    right: Frame,
    by: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> Frame:
    """Skew-resistant equi-join: each left row gets a salt in
    [0, n_salts); the right side is replicated once per salt value and
    the join runs on (keys…, salt). A hot left key spreads across
    ``n_salts`` shuffle partitions instead of hammering one.

    Use when the LEFT side is skewed on the join keys and the right
    side is too big to broadcast but small enough to replicate
    n_salts-fold (mid-size dims). The salt never changes the result —
    each left row carries exactly one salt and each right row appears
    exactly once per salt, so every matching pair meets exactly once.
    AQE's skew-join split covers many cases at runtime; this is the
    explicit, planner-independent form.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    missing = [k for k in by if k not in left.df.columns or k not in right.df.columns]
    if missing:
        raise ValueError(f"join keys missing on one side: {missing}")
    salt = "__join_salt"
    lsalt = (
        F.crc32(
            F.concat_ws(
                "§",
                *[F.col(k).cast("string") for k in by],
                F.monotonically_increasing_id().cast("string"),
            )
        )
        % n_salts
    ).cast("int")
    l = left.df.withColumn(salt, lsalt)
    r = right.df.withColumn(
        salt, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l.join(r, on=by + [salt], how=how).drop(salt)
    return Frame(out, ())
