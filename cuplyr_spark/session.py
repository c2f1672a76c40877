"""SparkSession bootstrap tuned for this engine.

Replaces the reference's GPU runtime probes (``has_gpu``/``gpu_details``,
cuplyr ``R/gpu.R:31-132``) with a properly configured SparkSession. The
defaults here are the scale-aware knobs the reference never needed
(single GPU, no shuffle): AQE on (runtime re-plan + skew-join handling),
shuffle partitions sized to cores in local mode, Arrow on for the
Python<->JVM boundary, UTC session timezone so results are comparable
with a DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    """Worker-thread count: $SPARK_GRAFT_CPUS, else all visible cores."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_session(
    app_name: str = "cuplyr_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or return the active) local SparkSession.

    In local mode there is one JVM; ``spark.driver.memory`` is the only
    memory knob. On a real cluster the same conf (AQE, adaptive
    coalescing, skew-join) carries over unchanged — nothing here is
    local-mode-specific except the master URL.
    """
    cpus = cpus or default_cpus()
    # One shuffle partition per core locally; a real cluster would size
    # this to total executor cores (AQE coalescing trims the excess).
    shuffle_partitions = shuffle_partitions or cpus

    # Local-mode shuffle goes through spark.local.dir; tmpfs removes
    # disk latency/jitter (a real cluster would point this at node-
    # local NVMe instead). Static conf — must be set before JVM start.
    local_dir = os.environ.get("CUPLYR_SPARK_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/cuplyr-spark-local"

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # dplyr/R semantics: arithmetic never raises (x/0 -> NULL like
        # the DuckDB oracle, not an ANSI error). Spark 4 defaults ANSI on.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Write modern annotated micros, not legacy INT96 (deprecated;
        # footer-ambiguous — external readers see INT96 as unit-ns).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("CUPLYR_SPARK_DRIVER_MEM", "32g"),
        )
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
