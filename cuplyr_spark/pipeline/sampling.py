"""Deterministic sampling / dataset splitting for training pipelines.

Hash-based, not RNG-based: membership depends only on the row's id, so
splits are reproducible across runs, engines, partitionings, and
incremental re-processing (a new batch of documents lands in the same
split its ids dictate — no reshuffling of old members). This is the
property RNG sampling (``df.sample``/``sampleBy``) cannot give you on
an evolving 100 TB corpus.

The hash is md5 (portable — the DuckDB oracle reproduces membership
bit-for-bit), mapped to a bucket in [0, granularity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame

GRANULARITY = 10_000


def hash_bucket(col: Column, salt: str = "", granularity: int = GRANULARITY) -> Column:
    """Stable bucket in [0, granularity) from an id column. ``salt``
    decorrelates independent splits over the same ids."""
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15), 16, 10
    ).cast("long")
    return h % granularity


def deterministic_split(
    frame: Frame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
) -> dict[str, Frame]:
    """Partition rows into named splits by hash bucket.

    ``weights`` maps split name -> fraction (must sum to <= 1; any
    remainder is dropped, which doubles as down-sampling)."""
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    bucket = hash_bucket(F.col(id_col), salt)
    out: dict[str, Frame] = {}
    lo = 0
    for name, w in weights.items():
        hi = lo + int(round(w * GRANULARITY))
        out[name] = Frame(
            frame.df.filter((bucket >= lo) & (bucket < hi)), frame.group_vars()
        )
        lo = hi
    return out


def with_split_label(
    frame: Frame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    label_col: str = "split",
) -> Frame:
    """Single-pass variant: one labeled frame instead of N filtered
    ones (the shape you want when writing one partitioned output)."""
    bucket = hash_bucket(F.col(id_col), salt)
    expr = F.lit(None).cast("string")
    lo = 0
    for name, w in weights.items():
        hi = lo + int(round(w * GRANULARITY))
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
        lo = hi
    return Frame(frame.df.withColumn(label_col, expr), frame.group_vars())


def stratified_hash_sample(
    frame: Frame,
    id_col: str,
    strata_col: str,
    fractions: dict,
    salt: str = "",
) -> Frame:
    """Per-stratum deterministic down-sampling (e.g. cap the 'en'
    share of a corpus): keep a row iff its hash bucket falls under its
    stratum's fraction. One filter, no shuffle, reproducible."""
    bucket = hash_bucket(F.col(id_col), salt)
    keep = F.lit(False)
    for value, frac in fractions.items():
        keep = keep | (
            (F.col(strata_col) == F.lit(value))
            & (bucket < int(round(frac * GRANULARITY)))
        )
    return Frame(frame.df.filter(keep), frame.group_vars())
