"""Lakehouse-format connectors (Delta / Iceberg / Hudi) — gated.

The format jars are not on this build's classpath; the readers raise
immediately with the exact conf needed rather than failing deep inside
the JVM. The engine's own surface (Frame verbs, pipeline ops) is
format-agnostic — once the jar + catalog conf is present these return
ordinary Frames and everything downstream works unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cuplyr_spark.frame import Frame

_HINTS = {
    "delta": (
        "io.delta:delta-spark_2.13:<version> on spark.jars.packages and "
        "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
    ),
    "iceberg": (
        "org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<version> and a "
        "spark.sql.catalog.<name> configuration"
    ),
    "hudi": "org.apache.hudi:hudi-spark3.5-bundle_2.13:<version>",
}


def _format_available(spark: SparkSession, fmt: str) -> bool:
    try:
        spark.read.format(fmt).load("/nonexistent/__probe__")
        return True  # pragma: no cover - load of missing path raises
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # ClassNotFound / DATA_SOURCE_NOT_FOUND -> jar missing;
        # path errors -> format resolved fine.
        return "DATA_SOURCE_NOT_FOUND" not in msg and "ClassNotFound" not in msg


def read_lakehouse(spark: SparkSession, fmt: str, path: str) -> Frame:
    """Read a Delta/Iceberg/Hudi table if the runtime has the format."""
    if fmt not in _HINTS:
        raise ValueError(f"unknown lakehouse format {fmt!r}")
    if not _format_available(spark, fmt):
        raise ModuleNotFoundError(
            f"{fmt} support requires {_HINTS[fmt]} (jar not on this "
            "classpath — stubbed per build constraints)"
        )
    return Frame(spark.read.format(fmt).load(path))  # pragma: no cover
