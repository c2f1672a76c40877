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


def histogram_sketch(
    frame: Frame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    by: list[str] | str | None = None,
    out: str = "hist",
) -> Frame:
    """Fixed-bin equi-width histogram of ``col`` over ``[lo, hi)`` —
    the quantile/distribution companion to :func:`distinct_sketch`,
    with an even stronger property: two histograms built with the SAME
    (lo, hi, bins) merge EXACTLY (element-wise sum), not just
    approximately. One row per ``by`` group (or one row total) with
    ``out`` = array<long> of ``bins`` counts.

    The shard pattern is identical to the HLL one: histogram each
    ingest shard / append-table segment once (a map-side array
    aggregate — ``bins`` longs per group per partition ride the
    shuffle, never rows), store the array rows, and fold with
    :func:`merge_histogram_sketches`; running quantiles of a growing
    100 TB corpus then cost one pass per NEW segment plus an
    array sum. Quantile estimates from the merged histogram
    (:func:`histogram_quantiles`) are off by at most one bin width —
    a bound chosen at build time via ``bins``, not data-dependent.

    Out-of-range values clamp into the edge bins (documented rule —
    the estimate's bound holds for in-range data; pick ``lo``/``hi``
    from a first-pass min/max or domain knowledge). NULLs are
    excluded, matching every aggregate in this engine.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    keys = [by] if isinstance(by, str) else list(by or [])
    width = (hi - lo) / bins
    idx = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    counts = (
        frame.df.filter(F.col(col).isNotNull())
        .groupBy(*keys, idx.alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # densify the sparse (group, bin, n) grain into one array row per
    # group: aggregate to a bin→count map, then one lookup per slot —
    # all column ops; the two-phase hash agg partial-combines map-side
    grouped = counts.groupBy(*keys) if keys else counts.groupBy()
    df = grouped.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__bin"), F.col("__n")))
        ).alias("__m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("__m"), i), F.lit(0).cast("long")
        ),
    ).alias(out)
    # stamp the binning so merges can refuse mismatched sketches
    spec = F.struct(
        F.lit(float(lo)).cast("double").alias("lo"),
        F.lit(float(hi)).cast("double").alias("hi"),
        F.lit(int(bins)).cast("int").alias("bins"),
    ).alias(f"{out}_spec")
    return Frame(df.select(*keys, dense, spec), ())


def merge_histogram_sketches(
    frame: Frame,
    hist_col: str = "hist",
    by: list[str] | str | None = None,
) -> Frame:
    """Fold stored histogram rows per ``by`` group by element-wise
    sum — EXACT (union of shard histograms IS the whole-data
    histogram, asserted in tests), associative, so yesterday's merged
    row folds with today's shard rows. Cost ∝ sketch rows × bins;
    refuses mismatched binning specs rather than summing
    incompatible arrays."""
    keys = [by] if isinstance(by, str) else list(by or [])
    spec = f"{hist_col}_spec"
    df = frame.df
    agg = [
        F.aggregate(
            F.collect_list(F.col(hist_col)),
            F.expr("cast(array() as array<bigint>)"),
            lambda acc, x: F.when(
                F.size(acc) == 0, x
            ).otherwise(F.zip_with(acc, x, lambda a, b: a + b)),
        ).alias("__h"),
        F.count_distinct(F.col(spec)).alias("__nspec"),
        F.first(F.col(spec)).alias(spec),
    ]
    out = (df.groupBy(*keys) if keys else df.groupBy()).agg(*agg)
    # the guard rides the OUTPUT column, so column pruning can never
    # optimize the mixed-spec check away
    merged = F.expr(
        "CASE WHEN __nspec > 1 THEN raise_error("
        "'merge_histogram_sketches: mixed binning specs in one group "
        "— histograms only merge exactly when built with the same "
        "(lo, hi, bins)') ELSE __h END"
    ).alias(hist_col)
    return Frame(out.select(*keys, merged, F.col(spec)), ())


def histogram_quantiles(
    frame: Frame,
    ps: list[float],
    hist_col: str = "hist",
    by: list[str] | str | None = None,
    out: str = "q",
) -> Frame:
    """Quantile estimates from (merged) histogram rows: linear
    interpolation within the containing bin, so each estimate is
    within ONE BIN WIDTH of the true quantile for in-range data — the
    deterministic error contract the fixed binning buys. Returns the
    input grouping columns plus ``out`` = array<double> aligned with
    ``ps``. Pure column ops over the ``bins``-length array (no
    shuffle: the rows are already one per group)."""
    if not ps or not all(0.0 <= p <= 1.0 for p in ps):
        raise ValueError("ps must be fractions in [0, 1]")
    keys = [by] if isinstance(by, str) else list(by or [])
    spec = f"{hist_col}_spec"
    df = frame.df
    h, s = F.col(hist_col), F.col(spec)
    total = F.aggregate(h, F.lit(0).cast("long"), lambda a, x: a + x)
    width = (s.hi - s.lo) / s.bins
    # cumulative counts once (a single O(bins) left-fold that appends
    # the running total per element — not the former O(bins²) re-sum
    # of a growing slice), then each quantile walks the small array
    cum = F.aggregate(
        h,
        F.struct(
            F.lit(0).cast("long").alias("t"),
            F.expr("array()").cast("array<long>").alias("a"),
        ),
        lambda acc, x: F.struct(
            (acc["t"] + x).alias("t"),
            F.concat(acc["a"], F.array(acc["t"] + x)).alias("a"),
        ),
        lambda acc: acc["a"],
    )
    df = df.withColumn("__cum", cum).withColumn("__total", total)

    def one(p):
        target = F.lit(p) * F.col("__total")
        # first bin index (0-based) whose cumulative count reaches target
        pos = F.array_position(
            F.transform(F.col("__cum"), lambda c: c >= target), F.lit(True)
        )  # 1-based; 0 if never (empty histogram)
        prev = F.when(pos > 1, F.element_at(F.col("__cum"), (pos - 1).cast("int"))).otherwise(F.lit(0))
        inbin = F.element_at(F.col(hist_col), pos.cast("int"))
        frac = F.when(inbin > 0, (target - prev) / inbin).otherwise(F.lit(0.0))
        est = s.lo + ((pos - 1).cast("double") + frac) * width
        return F.when(F.col("__total") > 0, est)

    df = df.withColumn(out, F.array(*[one(p) for p in ps]))
    return Frame(df.select(*keys, hist_col, spec, out) if keys else df.select(hist_col, spec, out), ())


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
