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

    def resolve(self, columns: Sequence[str], schema=None) -> list[str]:
        return [c for c in columns if self._fn(c, columns)]

    def __repr__(self) -> str:  # pragma: no cover
        return f"<selector {self._label}>"


class TypeSelector(Selector):
    """Selects by a predicate over each column's Spark ``DataType`` —
    tidyselect ``where()`` (the reference gets it free through
    ``tidyselect::eval_select``, cuplyr ``R/select.R:55-115``; e.g.
    ``select(tbl, where(is.numeric))``). Resolution is driver-side
    schema inspection only — no data touched."""

    def __init__(self, pred, label: str):
        super().__init__(None, label)
        self._pred = pred

    def resolve(self, columns: Sequence[str], schema=None) -> list[str]:
        if schema is None:
            raise TypeError(
                f"{self._label} selects by column type and needs the frame "
                "schema — use it inside select()/group_by(), not standalone"
            )
        types = {f.name: f.dataType for f in schema.fields}
        return [c for c in columns if c in types and self._pred(types[c])]


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


# -- where() + type predicates -------------------------------------------
#
# Mirrors R's `where(is.numeric)` etc. Each predicate receives a
# pyspark.sql.types.DataType. The R-style names (is_numeric ~
# base::is.numeric) follow the reference's ingest type map
# (cuplyr R/utils.R:4-23): numeric = int/long/float/double/decimal,
# character = string, logical = boolean.


def _dt_name(dt) -> str:
    return dt.typeName()


def is_numeric(dt) -> bool:
    return _dt_name(dt) in (
        "byte", "short", "integer", "long", "float", "double", "decimal",
    )


def is_integer(dt) -> bool:
    return _dt_name(dt) in ("byte", "short", "integer", "long")


def is_double(dt) -> bool:
    return _dt_name(dt) in ("float", "double", "decimal")


def is_character(dt) -> bool:
    return _dt_name(dt) == "string"


is_string = is_character


def is_logical(dt) -> bool:
    return _dt_name(dt) == "boolean"


def is_date(dt) -> bool:
    return _dt_name(dt) == "date"


def is_datetime(dt) -> bool:
    return _dt_name(dt) in ("timestamp", "timestamp_ntz")


def is_temporal(dt) -> bool:
    return is_date(dt) or is_datetime(dt)


def where(pred) -> TypeSelector:
    """tidyselect ``where()``: select columns whose Spark ``DataType``
    satisfies ``pred`` (one of the ``is_*`` helpers here, or any
    callable taking a ``DataType``). Example::

        tbl.select(where(is_numeric))
        tbl.select("l_orderkey", where(is_string))
    """
    if not callable(pred):
        raise TypeError("where() takes a predicate over a Spark DataType")
    label = f"where({getattr(pred, '__name__', repr(pred))})"
    return TypeSelector(pred, label)


def resolve_selection(args, columns: Sequence[str], schema=None) -> list[str]:
    """Flatten a mix of names / Selectors / iterables into column names.

    Order: selection order (as tidyselect), deduplicated keeping first
    occurrence. A leading ``-``/``!`` on a plain name means exclusion;
    if *all* args are exclusions, selection starts from all columns.
    ``schema`` (a StructType) enables type-based selectors (where()).
    """
    include: list[str] = []
    exclude: list[str] = []
    saw_include = False
    for arg in args:
        if isinstance(arg, Selector):
            include.extend(arg.resolve(columns, schema))
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
            nested = resolve_selection(arg, columns, schema)
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
