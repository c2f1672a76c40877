"""Bucketed tables: pre-shuffled storage for repeat-join workloads.

At 100 TB the same fact tables join on the same keys every day; paying
the shuffle once at write time and never again is the single biggest
join optimization available. Spark bucketing does exactly that:
``bucketBy(n, key)`` at write, and any later equi-join or aggregation
on the bucket key needs NO exchange on that side (verified by the
plan-shape test: a bucketed-bucketed join plans with zero Exchange
nodes).

Bucketed tables must live in the session catalog (saveAsTable), so a
warehouse location is part of the deal — pass it once to
``enable_warehouse`` or configure ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cuplyr_spark.frame import Frame


def write_bucketed(
    frame: Frame,
    table: str,
    n_buckets: int,
    *bucket_cols: str,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist as a bucketed (optionally sort-within-bucket) table."""
    writer = frame.df.write.mode(mode).format(format).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> Frame:
    return Frame(spark.table(table))


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
