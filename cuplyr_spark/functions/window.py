"""dplyr window-function verbs: lag/lead, ranks, cumulative aggregates.

The reference has NO window functions (SURVEY.md §2.10 — confirmed by
exhaustive read of its R/ and src/); these are part of the engine's
dplyr-parity extension surface (dplyr exports `lag`, `lead`,
`row_number`, `min_rank`, `dense_rank`, `percent_rank`, `cume_dist`,
`ntile`, `cumsum`, `cummean`, `cummax`, `cummin`, `cumany`, `cumall`).

Usage inside ``mutate`` on a (usually grouped) Frame::

    t.group_by("user_id").mutate(
        prev=win.lag("value", order_by=["ts", "event_id"]),
        bal_rank=win.min_rank(desc("balance")),
        run=win.cumsum("value", order_by="ts"),
    )

Each verb returns a deferred ``WinSpec``; ``Frame.mutate`` resolves it
with the frame's grouping columns as the window PARTITION BY. Scale
note: a grouped window shuffles once on the group keys and then runs
per-group — fine at any cardinality. An UNGROUPED ordered window is a
single partition (one task serializes the whole table); Spark warns
(`WindowExec: No Partition Defined`) and so do the docs here — group
first at scale.

Ordering follows the engine's arrange() NA rule (asc→NULLS LAST,
desc→NULLS FIRST, `src/ops_arrange.cpp:74-82`); pass ``desc(col)`` or
``"-col"`` for descending keys.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "WinSpec",
    "lag",
    "lead",
    "row_number",
    "min_rank",
    "dense_rank",
    "percent_rank",
    "cume_dist",
    "ntile",
    "cumsum",
    "cummean",
    "cummax",
    "cummin",
    "cumany",
    "cumall",
]


def _order_cols(order_by, reverse: bool = False) -> list[Column]:
    """``reverse=True`` flips every key's direction AND its NA end —
    used by slice_tail so "last n by k" = "first n by reversed k"."""
    # local import: frame.py lazily imports this module from mutate()
    from cuplyr_spark.frame import Desc, _as_column

    keys = order_by if isinstance(order_by, (list, tuple)) else [order_by]
    out: list[Column] = []
    for k in keys:
        if isinstance(k, str) and k.startswith("-") and k[1:].isidentifier():
            k = Desc(k[1:])
        descending = isinstance(k, Desc) != reverse
        c = _as_column(k.col if isinstance(k, Desc) else k)
        out.append(c.desc_nulls_first() if descending else c.asc_nulls_last())
    return out


class WinSpec:
    """Deferred window expression; resolved by Frame.mutate with the
    frame's group columns as PARTITION BY."""

    def __init__(self, build: Callable[[DataFrame, WindowSpec], Column], order_by):
        self._build = build
        self._order_by = order_by

    def resolve_window(self, df: DataFrame, groups: Iterable[str]) -> Column:
        w = Window.partitionBy(*[df[g] for g in groups])
        if self._order_by is not None:
            w = w.orderBy(*_order_cols(self._order_by))
        return self._build(df, w)


def _col(x) -> Column:
    from cuplyr_spark.frame import _as_column

    return _as_column(x)


def lag(x, n: int = 1, default=None, *, order_by) -> WinSpec:
    return WinSpec(lambda df, w: F.lag(_col(x), n, default).over(w), order_by)


def lead(x, n: int = 1, default=None, *, order_by) -> WinSpec:
    return WinSpec(lambda df, w: F.lead(_col(x), n, default).over(w), order_by)


def row_number(*, order_by) -> WinSpec:
    """1-based position. Make ``order_by`` a full tiebreak (unique per
    partition) or the assignment among ties is nondeterministic."""
    return WinSpec(lambda df, w: F.row_number().over(w), order_by)


def min_rank(order_by) -> WinSpec:
    """SQL rank(): ties share the minimum rank — deterministic under
    ties, unlike row_number."""
    return WinSpec(lambda df, w: F.rank().over(w), order_by)


def dense_rank(order_by) -> WinSpec:
    return WinSpec(lambda df, w: F.dense_rank().over(w), order_by)


def percent_rank(order_by) -> WinSpec:
    return WinSpec(lambda df, w: F.percent_rank().over(w), order_by)


def cume_dist(order_by) -> WinSpec:
    return WinSpec(lambda df, w: F.cume_dist().over(w), order_by)


def ntile(n: int, *, order_by) -> WinSpec:
    """Tile assignment among tied keys follows the physical tie order —
    make order_by unique for determinism."""
    return WinSpec(lambda df, w: F.ntile(n).over(w), order_by)


def _running(fn: Callable[[Column], Column], x, order_by) -> WinSpec:
    return WinSpec(
        lambda df, w: fn(_col(x)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
        order_by,
    )


def cumsum(x, *, order_by) -> WinSpec:
    return _running(F.sum, x, order_by)


def cummean(x, *, order_by) -> WinSpec:
    return _running(F.avg, x, order_by)


def cummax(x, *, order_by) -> WinSpec:
    return _running(F.max, x, order_by)


def cummin(x, *, order_by) -> WinSpec:
    return _running(F.min, x, order_by)


def cumany(x, *, order_by) -> WinSpec:
    return _running(lambda c: F.max(c.cast("boolean")), x, order_by)


def cumall(x, *, order_by) -> WinSpec:
    return _running(lambda c: F.min(c.cast("boolean")), x, order_by)
