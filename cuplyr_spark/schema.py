"""Type promotion rules for row-binding heterogeneous tables.

Mirrors the reference's bind_rows promotion lattice
(cuplyr ``R/bind.R:267-453``, ``src/ops_bind.cpp:185-287``):
BOOL < INT8 < INT16 < INT32 < INT64 < FLOAT32 < FLOAT64,
anything + STRING -> STRING, timestamps promote to the finer precision
(Spark: DateType < TimestampType). NullType (a column that exists only
as NULL fill) defers to the other side.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Numeric-ish widening order. A pair of types promotes to the one with
# the higher rank; bool counts as the narrowest numeric, as in the
# reference's lattice.
_NUMERIC_RANK: dict[type, int] = {
    T.BooleanType: 0,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 3,
    T.LongType: 4,
    T.FloatType: 5,
    T.DoubleType: 6,
}

_TEMPORAL_RANK: dict[type, int] = {
    T.DateType: 0,
    T.TimestampNTZType: 1,
    T.TimestampType: 2,
}


def promote_types(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common type of two column types under the bind_rows lattice.

    Raises TypeError for pairs the reference also rejects (e.g. numeric
    vs timestamp).
    """
    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    # STRING absorbs everything (reference: anything + STRING -> STRING).
    if isinstance(a, T.StringType) or isinstance(b, T.StringType):
        return T.StringType()
    ra, rb = _NUMERIC_RANK.get(type(a)), _NUMERIC_RANK.get(type(b))
    if ra is not None and rb is not None:
        return a if ra >= rb else b
    ta, tb = _TEMPORAL_RANK.get(type(a)), _TEMPORAL_RANK.get(type(b))
    if ta is not None and tb is not None:
        return a if ta >= tb else b
    if isinstance(a, T.DecimalType) and rb is not None:
        return T.DoubleType()
    if isinstance(b, T.DecimalType) and ra is not None:
        return T.DoubleType()
    raise TypeError(
        f"bind_rows: cannot promote incompatible column types "
        f"{a.simpleString()} and {b.simpleString()}"
    )


def unify_schemas(schemas: list[T.StructType]) -> list[tuple[str, T.DataType]]:
    """Unified (name, type) list for bind_rows.

    Column order: first table's columns in order, then columns new to
    each subsequent table in order of first appearance (reference:
    ``R/bind.R:267-330``).
    """
    order: list[str] = []
    resolved: dict[str, T.DataType] = {}
    for schema in schemas:
        for field in schema.fields:
            if field.name not in resolved:
                order.append(field.name)
                resolved[field.name] = field.dataType
            else:
                resolved[field.name] = promote_types(
                    resolved[field.name], field.dataType
                )
    return [(name, resolved[name]) for name in order]
