"""Engine/runtime introspection — the Spark analog of the reference's
GPU probes (``has_gpu``/``gpu_details``/``show_gpu``/``gpu_memory_usage``,
cuplyr ``R/gpu.R:31-132``, ``R/gpu-memory.R:40-401``, SURVEY §2.11)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def has_spark() -> bool:
    """Reference ``has_gpu()``: is there an active session?"""
    return SparkSession.getActiveSession() is not None


def engine_details(spark: SparkSession) -> dict:
    """Reference ``gpu_details()``: runtime facts for diagnostics."""
    sc = spark.sparkContext
    return {
        "spark_version": spark.version,
        "master": sc.master,
        "app_name": sc.appName,
        "default_parallelism": sc.defaultParallelism,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe_enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "arrow_enabled": spark.conf.get(
            "spark.sql.execution.arrow.pyspark.enabled"
        ),
        "ansi_enabled": spark.conf.get("spark.sql.ansi.enabled"),
        "session_timezone": spark.conf.get("spark.sql.session.timeZone"),
    }


def memory_usage(spark: SparkSession) -> list[dict]:
    """Reference ``gpu_memory_usage()``: per-storage cached tables."""
    sc = spark.sparkContext
    jvm_status = sc._jsc.sc().getRDDStorageInfo()
    out = []
    for info in jvm_status:
        out.append(
            {
                "name": info.name(),
                "mem_used_bytes": info.memSize(),
                "disk_used_bytes": info.diskSize(),
                "partitions_cached": info.numCachedPartitions(),
            }
        )
    return out


def clear_cache(spark: SparkSession) -> None:
    """Reference ``gpu_gc()``: drop all cached relations."""
    spark.catalog.clearCache()
