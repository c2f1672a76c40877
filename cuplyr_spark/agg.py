"""Aggregate function surface for ``summarise()``.

Reproduces the reference's aggregate set and result-type rules
(cuplyr ``R/summarise.R:17-26,461-503``, ``src/ops_groupby.cpp:21-40``):

- ``sum(int)`` -> long, ``sum(double)`` -> double   (Spark native)
- ``mean/sd/var`` -> double                          (Spark native)
- ``min/max`` preserve input type                    (Spark native)
- ``n()`` -> long, counts ALL rows including NULLs   (F.count(lit(1)))
- NULLs are excluded by sum/mean/min/max/sd/var      (Spark native)

Expression-in-aggregate (``sum(carb == 4)``, ``mean(x > 2)`` — reference
``R/summarise.R:204-397``) is supported by passing a boolean Column or
SQL string; booleans are cast to int before numeric aggregation,
matching the reference's comparison->INT32-column preprocessing
(``src/ops_compare.cpp:20-82``).

Helpers return an :class:`AggSpec` that ``Frame.summarise`` resolves
against the frame's schema (driver-side analysis only — no job runs),
so the bool->int cast is exact, not heuristic. Raw pyspark Columns are
also accepted by ``summarise`` for anything not covered here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_col(x: str | Column) -> Column:
    if isinstance(x, Column):
        return x
    if x.isidentifier():
        return F.col(x)
    from cuplyr_spark.functions.expr import compile_expr

    return compile_expr(x)


# Aggregates whose input must be numeric (bool operands -> 0/1 int).
_NUMERIC_INPUT = {"sum", "mean", "sd", "var", "median"}

_AGG_FN = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "sd": F.stddev_samp,  # R sd == sample stddev
    "var": F.var_samp,  # R var == sample variance
    "median": F.median,
    "first": lambda c: F.first(c, ignorenulls=False),
    "last": lambda c: F.last(c, ignorenulls=False),
}


@dataclass(frozen=True)
class AggSpec:
    """A deferred aggregate: resolved to a pyspark Column per-frame."""

    kind: str
    operand: str | Column | None = None
    extra: tuple = ()

    def resolve(self, df: DataFrame) -> Column:
        if self.kind == "n":
            return F.count(F.lit(1))
        if self.kind == "count_col":
            return F.count(_as_col(self.operand))
        if self.kind == "n_distinct":
            return F.count_distinct(*[_as_col(c) for c in self.extra])
        if self.kind == "approx_n_distinct":
            return F.approx_count_distinct(_as_col(self.operand), *self.extra)
        if self.kind == "quantile":
            return F.percentile(_as_col(self.operand), F.lit(self.extra[0]))
        if self.kind == "approx_quantile":
            return F.percentile_approx(
                _as_col(self.operand), F.lit(self.extra[0]), F.lit(self.extra[1])
            )
        col = _as_col(self.operand)
        if self.kind in _NUMERIC_INPUT and _is_boolean(df, col):
            col = col.cast("int")
        return _AGG_FN[self.kind](col)


def _is_boolean(df: DataFrame, col: Column) -> bool:
    """Exact driver-side type check — analysis only, no execution."""
    try:
        return isinstance(df.select(col).schema[0].dataType, T.BooleanType)
    except Exception:
        return False


def n() -> AggSpec:
    """Row count including NULLs (reference ``null_policy::INCLUDE``)."""
    return AggSpec("n")


def count(x: str | Column | None = None) -> AggSpec:
    """``count`` is accepted as an alias for ``n`` in the reference."""
    return AggSpec("n") if x is None else AggSpec("count_col", x)


def n_distinct(*cols: str | Column) -> AggSpec:
    return AggSpec("n_distinct", extra=tuple(cols))


def approx_n_distinct(x: str | Column, rsd: float = 0.05) -> AggSpec:
    """HLL distinct estimate — the 100 TB-friendly n_distinct."""
    return AggSpec("approx_n_distinct", x, (rsd,))


def sum(x: str | Column) -> AggSpec:  # noqa: A001 - dplyr surface
    return AggSpec("sum", x)


def mean(x: str | Column) -> AggSpec:
    return AggSpec("mean", x)


def min(x: str | Column) -> AggSpec:  # noqa: A001
    return AggSpec("min", x)


def max(x: str | Column) -> AggSpec:  # noqa: A001
    return AggSpec("max", x)


def sd(x: str | Column) -> AggSpec:
    return AggSpec("sd", x)


def var(x: str | Column) -> AggSpec:
    return AggSpec("var", x)


def median(x: str | Column) -> AggSpec:
    return AggSpec("median", x)


def quantile(x: str | Column, p: float) -> AggSpec:
    """Exact linear-interpolated quantile (SQL percentile_cont /
    DuckDB quantile_cont semantics). Exact = full sort per group;
    prefer approx_quantile for 100 TB-scale interactive use."""
    return AggSpec("quantile", x, (p,))


def approx_quantile(x: str | Column, p: float, accuracy: int = 10_000) -> AggSpec:
    """Greenwald-Khanna sketch quantile: mergeable, one pass, no sort —
    the scale path. Error <= 1/accuracy relative rank."""
    return AggSpec("approx_quantile", x, (p, accuracy))


def first(x: str | Column) -> AggSpec:
    return AggSpec("first", x)


def last(x: str | Column) -> AggSpec:
    return AggSpec("last", x)


def across(cols, **fns) -> dict:
    """dplyr across() for summarise/mutate: apply each named fn to each
    column, producing ``{col}_{fn}`` outputs. Splat into summarise::

        t.group_by("g").summarise(**across(["x", "y"], mean=mean, max=max))
    """
    return {f"{c}_{name}": fn(c) for c in cols for name, fn in fns.items()}
