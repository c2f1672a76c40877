"""Lakehouse-format connectors.

Two tiers:

- **Jar-gated readers** (Delta / Iceberg / Hudi): the format jars are
  not on this build's classpath; the readers raise immediately with the
  exact conf needed rather than failing deep inside the JVM. Once the
  jar + catalog conf is present these return ordinary Frames and
  everything downstream works unchanged.
- **Snapshot tables** (jar-free, works everywhere Spark reads parquet):
  versioned parquet directories published by an atomic manifest swap —
  readers only ever see a fully-written version, old versions stay
  readable (time travel). This is the core mechanism the lakehouse
  formats formalize (Delta's _delta_log, Iceberg's metadata pointer),
  reduced to one pointer file; it provides their two essential
  guarantees (atomic publish, versioned reads) without transactions,
  schema evolution, or compaction.

  Scope (enforced, not just documented): **local filesystem,
  single-writer**. The manifest IO uses driver-local ``os.*`` calls
  while the parquet write goes through Spark's Hadoop FS layer, so a
  remote ``table_dir`` (hdfs://, s3a://, ...) would land the data
  remotely but the ``_LATEST`` pointer on the driver's local disk —
  every snapshot function therefore REJECTS URI-scheme paths up front.
  Concurrent writers are also out of scope (last manifest swap wins; a
  slow writer of v2 can regress the pointer after v3 published) —
  coordinate writers externally, or use the real lakehouse formats,
  which exist precisely to solve these two problems.
"""

from __future__ import annotations

import os
import re

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


# -- snapshot tables (jar-free versioned parquet) -----------------------

_MANIFEST = "_LATEST"

_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def _check_local(table_dir: str) -> str:
    """Reject URI-scheme table dirs: manifest IO is driver-local os.*
    while frame.df.write goes through Hadoop FS — a remote scheme
    would silently split data (remote) from pointer (driver disk).
    ``file://`` is accepted and stripped (both layers agree on it)."""
    if _URI_SCHEME.match(table_dir):
        if table_dir.startswith("file://"):
            return table_dir[len("file://"):]
        raise ValueError(
            f"snapshot tables are local-filesystem only, got {table_dir!r}; "
            "the manifest pointer is written with driver-local file IO, so a "
            "remote scheme would publish data remotely but the _LATEST "
            "pointer on the driver's disk. Use Delta/Iceberg/Hudi for "
            "remote/multi-writer tables (read_lakehouse)."
        )
    return table_dir


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


def snapshot_versions(table_dir: str) -> list[int]:
    """All version directories present (published or not), ascending."""
    table_dir = _check_local(table_dir)
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def latest_snapshot_version(table_dir: str) -> int | None:
    """The PUBLISHED version (manifest pointer), or None."""
    table_dir = _check_local(table_dir)
    try:
        with open(_manifest_path(table_dir)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def write_snapshot(frame: Frame, table_dir: str) -> int:
    """Publish the frame as the table's next version.

    The data lands in ``v=<n+1>/`` first; only after the parquet write
    completes is the manifest pointer swapped (write-temp + atomic
    rename), so a concurrent reader either sees the previous complete
    version or the new complete version — never a partial directory.
    A writer crash leaves an orphan ``v=`` dir that readers ignore.
    Returns the published version number."""
    table_dir = _check_local(table_dir)
    os.makedirs(table_dir, exist_ok=True)
    version = max(snapshot_versions(table_dir), default=0) + 1
    data_dir = os.path.join(table_dir, f"v={version}")
    frame.df.write.mode("errorifexists").parquet(data_dir)
    tmp = _manifest_path(table_dir) + f".tmp.{version}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _manifest_path(table_dir))
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> Frame:
    """Read the published version (default) or a pinned earlier one
    (time travel). Unpublished/orphaned version dirs are never read."""
    table_dir = _check_local(table_dir)
    if version is None:
        version = latest_snapshot_version(table_dir)
        if version is None:
            raise FileNotFoundError(
                f"no published snapshot at {table_dir!r} (missing {_MANIFEST})"
            )
    data_dir = os.path.join(table_dir, f"v={version}")
    if not os.path.isdir(data_dir):
        raise FileNotFoundError(f"snapshot version {version} not found in {table_dir!r}")
    from cuplyr_spark.sources.readers import read_parquet

    return read_parquet(spark, data_dir)


def upsert_snapshot(
    spark: SparkSession,
    frame: Frame,
    table_dir: str,
    key: str | list[str],
    delete_filter: str | None = None,
) -> int:
    """Keyed merge (upsert) into a snapshot table: rows in ``frame``
    REPLACE current rows with the same key; all other current rows
    carry over; ``delete_filter`` (a SQL predicate over the CURRENT
    version, e.g. ``"expired = true"``) drops matching carried-over
    rows — the three clauses of a lakehouse MERGE, without jars.

    Copy-on-write at table grain: the next version is written whole
    (current ▷ anti-join on key ∪ new), then published with the same
    atomic manifest swap as ``write_snapshot`` — readers never see a
    half-merged table, and time travel to pre-merge versions keeps
    working. Single-writer, local-filesystem (``_check_local``), like
    the rest of the snapshot layer.

    Scale shape: the anti-join shuffles on the merge key exactly once;
    when ``frame`` is small relative to the table AQE plans it as a
    broadcast anti-join, so the cost is one pass over the current
    version plus the parquet write. A 100 TB deployment would use
    partition-granular rewrite (Delta/Iceberg, ``read_lakehouse``);
    this is the honest jar-free equivalent with whole-table grain.

    Returns the published version. First upsert into an empty table
    publishes ``frame`` as v1.
    """
    keys = [key] if isinstance(key, str) else list(key)
    table_dir_local = _check_local(table_dir)
    if latest_snapshot_version(table_dir_local) is None:
        return write_snapshot(frame, table_dir)
    current = read_snapshot(spark, table_dir)
    missing = [k for k in keys if k not in current.df.columns]
    if missing or [k for k in keys if k not in frame.df.columns]:
        raise ValueError(f"merge key {keys} not present in both sides")
    if sorted(current.df.columns) != sorted(frame.df.columns):
        raise ValueError(
            f"schema mismatch: table has {sorted(current.df.columns)}, "
            f"upsert has {sorted(frame.df.columns)}"
        )
    kept = current.df.join(frame.df.select(*keys), on=keys, how="left_anti")
    if delete_filter is not None:
        kept = kept.filter(f"NOT ({delete_filter})")
    merged = kept.select(*current.df.columns).unionByName(
        frame.df.select(*current.df.columns)
    )
    return write_snapshot(Frame(merged, ()), table_dir)
