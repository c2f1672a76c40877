"""Sources / sinks (SURVEY §2.1).

The reference has exactly one source (in-memory R data.frame ->
host-to-device transfer, cuplyr ``src/transfer_io.cpp:604-643``) and one
sink (collect back to tibble). Here the ingest surface is Spark's
format-native scan layer — parquet first (columnar, predicate pushdown,
partition pruning), which is what the 100 TB deployment actually reads.
``from_pandas`` preserves the reference's data.frame entry point via the
Arrow fast path.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cuplyr_spark.frame import Frame

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def tbl(df: DataFrame) -> Frame:
    """Wrap an existing DataFrame (the ``as_tbl_gpu`` analog)."""
    return Frame(df)


def from_pandas(
    spark: SparkSession,
    pdf,
    schema: T.StructType | None = None,
    factors: str = "string",
) -> Frame:
    """In-memory ingest (reference ``tbl_gpu(data.frame)``), Arrow path.

    ``factors`` controls pandas Categorical columns (the reference's
    R-factor/DICTIONARY32 handling, ``R/tbl-gpu.R:88-99``):

    - ``"string"`` (default, SURVEY §7's simplest-representation
      decision): categories become plain strings.
    - ``"codes"``: categories become Int32 codes on the cluster and the
      level list rides along as Frame metadata; ``collect()`` restores
      a pandas Categorical (reference ``R/collect.R:74-81``).
    """
    import pandas as pd

    levels: dict[str, list] = {}
    cat_cols = [
        c for c in pdf.columns if isinstance(pdf[c].dtype, pd.CategoricalDtype)
    ]
    if cat_cols:
        pdf = pdf.copy()
        for c in cat_cols:
            if factors == "codes":
                levels[c] = list(pdf[c].cat.categories)
                pdf[c] = pd.array(
                    [None if v == -1 else int(v) for v in pdf[c].cat.codes],
                    dtype="Int32",
                )
            else:
                pdf[c] = pdf[c].astype(object).where(pdf[c].notna(), None)
    return Frame(spark.createDataFrame(pdf, schema=schema), factor_levels=levels or None)


def read_parquet(spark: SparkSession, path: str, coerce_nanos: bool = True) -> Frame:
    """Parquet scan. ``coerce_nanos`` transparently handles
    nanosecond-precision timestamp columns, which Spark 4 rejects
    (PARQUET_TYPE_ILLEGAL): they are read as int64 nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and cast back to
    TimestampType via integer division (``DIV 1000`` — exact; double
    division would corrupt epochs beyond 2^53).

    The reader guarantees a single timestamp type out the door:
    TIMESTAMP (with local-tz semantics). Parquet files whose columns
    carry ``isAdjustedToUTC=false`` (plain ``timestamp[us]`` written by
    arrow/pandas without a tz) surface as TIMESTAMP_NTZ under Spark 4,
    which ``unix_millis``/``unix_micros`` reject and ``cast(long)``
    forbids — so every ``TimestampNTZType`` column is cast to
    ``TimestampType`` here. The session timezone is pinned UTC
    (``session.py``), so the cast reinterprets the same wall-clock
    instant with identical epoch values; downstream operators
    (as-of/range joins, event windows) then see one timestamp type."""
    if not coerce_nanos:
        return Frame(_denoz(spark.read.parquet(path)))
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # Guard on the READ type: INT96 timestamps (Spark's legacy
        # output format) also surface as unit-ns in the parquet footer
        # but Spark reads them as TIMESTAMP directly — only columns
        # that actually arrived as int64 nanos need the cast.
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return Frame(_denoz(df))


def _denoz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP (UTC session tz —
    same epoch instant, one timestamp type engine-wide)."""
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) — from the parquet footer."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options,
) -> Frame:
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Schema inference re-reads the data; acceptable for ad-hoc use,
        # pass an explicit schema in production pipelines.
        reader = reader.option("inferSchema", True)
    return Frame(reader.csv(path))


def read_json(spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options) -> Frame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return Frame(reader.json(path))


def read_orc(spark: SparkSession, path: str) -> Frame:
    return Frame(_denoz(spark.read.orc(path)))


def load_tables(spark: SparkSession, sf_dir: str, tables=TPCH_TABLES) -> dict[str, Frame]:
    """Load the driver's TPC-H-ish test tables from a scale-factor dir."""
    out = {}
    for name in tables:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = read_parquet(spark, p)
    return out


def write_parquet(frame: Frame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = frame.df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(frame: Frame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    frame.df.write.mode(mode).option("header", header).csv(path)


def write_json(frame: Frame, path: str, mode: str = "overwrite") -> None:
    frame.df.write.mode(mode).json(path)


def write_orc(frame: Frame, path: str, mode: str = "overwrite") -> None:
    frame.df.write.mode(mode).orc(path)


def write_parquet_sorted(
    frame: Frame,
    path: str,
    sort_by: str | list[str],
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    num_files: int | None = None,
) -> None:
    """Parquet write with DATA LAYOUT for scan pruning: range-partition
    on the sort keys, then sort within each partition before writing.

    Each output file then covers a narrow, non-overlapping range of
    the sort key, so its parquet row-group/file min-max statistics
    become selective — a pushed-down point or range predicate skips
    whole files instead of scanning everything. This is the jar-free
    core of what table formats call clustering/Z-ordering (single-key
    case), and at 100 TB it is the difference between a key lookup
    touching one file and touching all of them. Costs one range
    exchange (with a sampling pass to pick balanced boundaries) at
    write time — paid once, saved on every subsequent selective read.

    ``num_files`` pins the range-partition count (file sizing: target
    ~128 MB-1 GB per file at scale); by default Spark/AQE choose.
    """
    keys = [sort_by] if isinstance(sort_by, str) else list(sort_by)
    if num_files is not None:
        df = frame.df.repartitionByRange(num_files, *keys)
    else:
        df = frame.df.repartitionByRange(*keys)
    df = df.sortWithinPartitions(*keys)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_parquet_zorder(
    frame: Frame,
    path: str,
    cols: list[str],
    bits: int = 16,
    mode: str = "overwrite",
    num_files: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Multi-column layout clustering: order files along a Z-ORDER
    (Morton) curve over ``cols`` so selective predicates on ANY of the
    clustered columns skip most files — what a single-key sort
    (``write_parquet_sorted``) can only do for its leading key.

    Each column is min-max scaled to a ``bits``-bit integer (one tiny
    2-value aggregate per column, collected once at write time), the
    per-column bits are interleaved into a Morton code, and the data
    is range-partitioned + sorted by that code. Nearby Z-values are
    nearby in EVERY dimension, so per-file min/max footer stats stay
    tight on all clustered columns at once. This is the jar-free core
    of Delta/Iceberg ``ZORDER BY``; like there, it is approximate
    clustering — pruning improves by ~n^(1/k) per k clustered columns,
    not to a single file.

    Null handling: NULLs scale to bucket 0 and therefore cluster
    together in the lowest files.

    ``partition_by`` writes hive partition directories AND z-orders
    within each of them: the range partitioning runs on ``(partition
    cols…, z-key)``, so each task holds a contiguous slice of one (or
    a few) partition values and the files it emits into a given
    directory are z-key-disjoint from its neighbors' — Delta's
    OPTIMIZE ZORDER BY on a partitioned table. The Morton scaling
    stats stay global (one tiny aggregate): only ORDER matters for
    clustering, and per-partition rescaling would buy nothing while
    costing a groupBy.

    Clustered columns must be numeric (or date/timestamp, which order
    numerically): a string column would cast to all-NULL doubles, its
    dimension would silently scale to constant 0, and the caller would
    believe the data is clustered on it — so non-orderable types are
    refused up front, and a column whose min/max still come back NULL
    (all-NULL data) raises instead of degrading.
    """
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("need 1 <= bits*len(cols) <= 63")
    ok = ("byte", "short", "integer", "long", "float", "double", "decimal",
          "date", "timestamp", "timestamp_ntz", "boolean")
    types = {f.name: f.dataType.typeName() for f in frame.df.schema.fields}
    bad = [c for c in cols if types.get(c) not in ok]
    if bad:
        raise TypeError(
            f"write_parquet_zorder: non-numeric column(s) {bad} "
            f"({ {c: types.get(c) for c in bad} }) cannot be min-max "
            "scaled into the Morton code — cluster on numeric/date/"
            "timestamp columns, or pre-encode strings to a numeric key "
            "(e.g. xxhash64) yourself."
        )

    def znum(c: str) -> Column:
        # date has no direct double cast; route it through timestamp
        # (epoch seconds) — only ORDER matters for the Morton scaling.
        col = F.col(c)
        if types[c] == "date":
            col = col.cast("timestamp")
        return col.cast("double")

    stats = frame.df.agg(
        *[F.min(znum(c)).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(znum(c)).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        if mn is None or mx is None:
            raise ValueError(
                f"write_parquet_zorder: column {c!r} has NULL min/max "
                "(all rows NULL) — it cannot contribute to the layout; "
                "drop it from cols."
            )
        if mx == mn:
            scaled.append(F.lit(0).cast("long"))
            continue
        frac = (znum(c) - F.lit(mn)) / F.lit(mx - mn)
        scaled.append(
            F.coalesce(
                F.least(
                    F.floor(frac * (top + 1)).cast("long"), F.lit(top).cast("long")
                ),
                F.lit(0).cast("long"),
            )
        )
    morton = F.lit(0).cast("long")
    k = len(cols)
    for b in range(bits):
        for i in range(k):
            morton = morton.bitwiseOR(
                F.shiftleft(
                    F.shiftright(scaled[i], b).bitwiseAND(F.lit(1)),
                    b * k + i,
                )
            )
    zc = "__cuplyr_zorder__"
    df = frame.df.withColumn(zc, morton)
    pby = list(partition_by or [])
    range_cols = [F.col(c) for c in pby] + [F.col(zc)]
    if num_files is not None:
        df = df.repartitionByRange(num_files, *range_cols)
    else:
        df = df.repartitionByRange(*range_cols)
    df = df.sortWithinPartitions(*pby, zc).drop(zc)
    writer = df.write.mode(mode)
    if pby:
        writer = writer.partitionBy(*pby)
    writer.parquet(path)
