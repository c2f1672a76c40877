"""tidyselect-style column selectors.

The reference routes ``select()`` through ``tidyselect::eval_select``
(cuplyr ``R/select.R:55-115``), giving helpers like ``starts_with``.
Here each helper is a small object resolved against ``df.columns`` at
plan-build time — pure driver-side name arithmetic, no data touched.
"""

from __future__ import annotations

import re
from collections.abc import Sequence


class Selector:
    """Resolves to a list of column names given the frame's columns."""

    def __init__(self, fn, label: str):
        self._fn = fn
        self._label = label

    def resolve(self, columns: Sequence[str]) -> list[str]:
        return [c for c in columns if self._fn(c, columns)]

    def __repr__(self) -> str:  # pragma: no cover
        return f"<selector {self._label}>"


def starts_with(prefix: str) -> Selector:
    return Selector(lambda c, _: c.startswith(prefix), f"starts_with({prefix!r})")


def ends_with(suffix: str) -> Selector:
    return Selector(lambda c, _: c.endswith(suffix), f"ends_with({suffix!r})")


def contains(needle: str) -> Selector:
    return Selector(lambda c, _: needle in c, f"contains({needle!r})")


def matches(pattern: str) -> Selector:
    rx = re.compile(pattern)
    return Selector(lambda c, _: rx.search(c) is not None, f"matches({pattern!r})")


def everything() -> Selector:
    return Selector(lambda c, _: True, "everything()")


def num_range(prefix: str, rng: Sequence[int]) -> Selector:
    names = {f"{prefix}{i}" for i in rng}
    return Selector(lambda c, _: c in names, f"num_range({prefix!r})")


def all_of(names: Sequence[str]) -> Selector:
    """Strict selection: every name must exist (checked at resolve)."""
    wanted = list(names)

    def fn(c, columns):
        missing = [n for n in wanted if n not in columns]
        if missing:
            raise KeyError(f"all_of(): unknown columns {missing}")
        return c in wanted

    return Selector(fn, f"all_of({wanted!r})")


def any_of(names: Sequence[str]) -> Selector:
    wanted = set(names)
    return Selector(lambda c, _: c in wanted, f"any_of({sorted(wanted)!r})")


def last_col() -> Selector:
    return Selector(lambda c, columns: c == columns[-1], "last_col()")


def resolve_selection(args, columns: Sequence[str]) -> list[str]:
    """Flatten a mix of names / Selectors / iterables into column names.

    Order: selection order (as tidyselect), deduplicated keeping first
    occurrence. A leading ``-``/``!`` on a plain name means exclusion;
    if *all* args are exclusions, selection starts from all columns.
    """
    include: list[str] = []
    exclude: list[str] = []
    saw_include = False
    for arg in args:
        if isinstance(arg, Selector):
            include.extend(arg.resolve(columns))
            saw_include = True
        elif isinstance(arg, str):
            if arg.startswith("-") or arg.startswith("!"):
                exclude.append(arg[1:])
            else:
                if arg not in columns:
                    raise KeyError(f"select(): unknown column {arg!r}")
                include.append(arg)
                saw_include = True
        elif isinstance(arg, (list, tuple)):
            nested = resolve_selection(arg, columns)
            include.extend(nested)
            saw_include = True
        else:
            raise TypeError(f"select(): cannot interpret {arg!r}")
    if not saw_include:
        include = list(columns)
    seen: set[str] = set()
    out = []
    for c in include:
        if c not in seen and c not in exclude:
            seen.add(c)
            out.append(c)
    return out
