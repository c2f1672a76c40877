"""Cardinality sketches and frequency analysis: mergeable HLL
distinct-count sketches, exact/approximate distinct counts, and
heavy-hitter (top-k frequent value) extraction.

Why sketches are a first-class 100 TB primitive: an exact
COUNT(DISTINCT) over a petabyte-scale key column shuffles one row per
(group, key) pair — correct, but the shuffle is ∝ distinct keys. A
DataSketches HLL sketch (Spark's ``hll_sketch_agg`` family, the
Apache DataSketches HllSketch under the hood) partial-aggregates to a
FIXED-SIZE binary per group per partition, so the shuffle is ∝ groups,
not keys, and — the property that matters for incremental pipelines —
sketches are LOSSLESSLY MERGEABLE: sketch each ingest shard once,
store the sketch bytes, and the running distinct count of the whole
corpus is a union of stored sketches. Paired with the append-table
change feed (``connectors.read_append_changes``) that means distinct
statistics over a growing 100 TB corpus cost one pass over each NEW
segment, never a rescan.

The reference engine has no sketch surface (its aggregates are the
exact sum/mean/min/max/n/sd/var set, ``R/summarise.R``,
``src/ops_aggregate.cpp``) — this module is part of the
beyond-reference extension layer, same tier as the dedup/similarity
pipeline.

Heavy hitters: the Spark-idiomatic answer to SpaceSaving/Misra-Gries
is an exact two-phase hash aggregate + ``TakeOrderedAndProject``.
Partial (map-side) aggregation already bounds the shuffle at one row
per distinct value per partition, the final aggregate spills rather
than OOMs on ultra-high cardinality, and the top-k never materializes
a global sort. A lossy sketch would only save the per-key shuffle row
— and unlike the streaming setting it could not be verified without a
second pass, so batch heavy-hitters stay exact here.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame


def distinct_sketch(
    frame: Frame,
    col: str,
    by: list[str] | str | None = None,
    lgk: int = 12,
    out: str = "sketch",
) -> Frame:
    """Build a mergeable DataSketches HLL sketch of ``col``'s distinct
    values, one row per ``by`` group (or one row total). The result's
    ``out`` column is the sketch binary — store it (e.g. one sketch
    row per ingest shard in an append table) and fold later with
    :func:`merge_distinct_sketches`; no raw key ever needs to be kept
    or re-read.

    ``lgk`` is the DataSketches log2(K) accuracy knob: relative
    standard error ≈ 1.04 / sqrt(2^lgk) (~1.6% at the default 12,
    ~0.8% at 14) at a few KB per sketch. Sketches built with the same
    ``lgk`` merge losslessly (union of sketches == sketch of union —
    asserted in tests, not just claimed).

    Plan shape: one partial-aggregated hash aggregate — sketch bytes
    ride the shuffle, keys do not.
    """
    if not 4 <= lgk <= 21:  # DataSketches HllSketch bounds
        raise ValueError(f"lgk must be in [4, 21], got {lgk}")
    keys = [by] if isinstance(by, str) else list(by or [])
    agg = F.hll_sketch_agg(F.col(col), lgk).alias(out)
    df = frame.df.groupBy(*keys).agg(agg) if keys else frame.df.agg(agg)
    return Frame(df, ())


def merge_distinct_sketches(
    frame: Frame,
    sketch_col: str = "sketch",
    by: list[str] | str | None = None,
    out: str = "n_distinct_est",
    keep_sketch: bool = False,
) -> Frame:
    """Union stored HLL sketches per ``by`` group and estimate the
    combined distinct count — the fold half of the
    sketch-per-shard pattern. Input rows are sketch binaries from
    :func:`distinct_sketch` (any number of shards, same ``lgk``);
    output is one row per group with ``out`` = estimated distinct
    count (long), plus the merged sketch itself when
    ``keep_sketch=True`` so the fold can continue incrementally
    (union is associative: merge yesterday's merged sketch with
    today's shard sketch).

    Cost ∝ number of sketch rows — for the shard pattern that is
    shards × groups, independent of corpus size.
    """
    if keep_sketch and out == sketch_col:
        raise ValueError(
            f"out {out!r} collides with sketch_col under keep_sketch=True"
        )
    keys = [by] if isinstance(by, str) else list(by or [])
    merged = F.hll_union_agg(F.col(sketch_col)).alias("__merged")
    df = frame.df.groupBy(*keys).agg(merged) if keys else frame.df.agg(merged)
    df = df.withColumn(
        out, F.hll_sketch_estimate(F.col("__merged")).cast("long")
    )
    df = (
        df.withColumnRenamed("__merged", sketch_col)
        if keep_sketch
        else df.drop("__merged")
    )
    return Frame(df, ())


def approx_distinct(
    frame: Frame,
    col: str,
    by: list[str] | str | None = None,
    rsd: float = 0.05,
    exact: bool = False,
    out: str = "n_distinct",
) -> Frame:
    """Distinct count of ``col`` per ``by`` group: HyperLogLog++
    estimate (``approx_count_distinct``, relative sd ``rsd``) by
    default, or the exact count with ``exact=True``.

    The approximate path is the 100 TB default — fixed-size HLL
    registers ride the shuffle instead of one row per (group, key),
    so cost is ∝ groups. The exact path is the verification/oracle
    mode: Spark plans it as the two-phase distinct aggregate
    (keys+group partial, then group final), still fully distributed
    and spill-safe, just ∝ distinct keys on the wire. Use
    :func:`distinct_sketch` instead when the count must be updatable
    incrementally — ``approx_count_distinct`` returns only the
    number, not a mergeable state.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    agg = (
        F.count_distinct(F.col(col)).alias(out)
        if exact
        else F.approx_count_distinct(F.col(col), rsd).alias(out)
    )
    df = frame.df.groupBy(*keys).agg(agg) if keys else frame.df.agg(agg)
    return Frame(df, ())


def heavy_hitters(
    frame: Frame,
    col: str,
    k: int = 20,
    by: list[str] | str | None = None,
    min_count: int = 1,
    count_col: str = "n",
) -> Frame:
    """The ``k`` most frequent values of ``col`` (optionally per
    ``by`` group), exact, with a deterministic tiebreak (count
    descending, then value ascending) so results are reproducible and
    oracle-comparable. Rows below ``min_count`` never rank.

    Global shape: hash aggregate (map-side partial combine bounds the
    shuffle at one row per value per partition) +
    ``TakeOrderedAndProject`` — the top-k never sorts the full
    frequency table. Grouped shape: the same aggregate + one rank
    window partitioned by the group keys (bounded state per group —
    skew-safe because window input is the compacted per-(group,value)
    grain, not raw rows).

    Feeds the dedup layer directly: heavy-hitter n-grams over a corpus
    are the measured way to pick ``substring_dup_spans``'
    ``max_gram_freq`` cap or spot boilerplate for the LSH bucket
    guard.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if count_col == col:
        raise ValueError(
            f"count_col {count_col!r} collides with the value column — "
            "pass a different count_col"
        )
    keys = [by] if isinstance(by, str) else list(by or [])
    counts = frame.df.groupBy(*keys, col).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    if min_count > 1:
        counts = counts.filter(F.col(count_col) >= min_count)
    if not keys:
        return Frame(
            counts.orderBy(F.desc(count_col), F.asc(col)).limit(k), ()
        )
    w = Window.partitionBy(*keys).orderBy(F.desc(count_col), F.asc(col))
    return Frame(
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk"),
        (),
    )
