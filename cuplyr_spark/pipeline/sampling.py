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


def resample_to_mixture(
    frame: Frame,
    group_col: str,
    targets: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    weight_col: str | None = None,
) -> Frame:
    """Deterministically down-sample groups to hit a target mixture
    (domain-weighting a training corpus: "20% code, 30% web, ...").

    Keeps every row of the binding group (the one whose share must
    grow most relative to its size) and hash-samples the rest so the
    kept counts land on ``targets``' proportions. Groups absent from
    ``targets`` are dropped. No RNG: membership is the md5 bucket of
    ``id_col``, so the sample is stable across runs and engines and
    only shrinks monotonically as targets tighten.

    ``weight_col=`` switches the mixture from ROW proportions to
    WEIGHT-MASS proportions — pass a token-count column and the
    targets become TOKEN shares, which is how LLM training mixtures
    are actually specified ("30% of tokens from web"). The kept set
    stays hash-deterministic per id; per-group keep RATES are sized
    so the expected kept token mass lands on the targets (hash
    membership is independent of document length, so realized shares
    concentrate on the targets at corpus scale — exact-knapsack
    selection would make membership depend on other rows and lose
    the stable-membership property this function exists for).

    Fully declarative: a tiny per-group count/sum aggregate re-joined
    by broadcast — the corpus itself never shuffles.
    """
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"mixture targets must sum to 1, got {total}")
    if any(w <= 0 for w in targets.values()):
        raise ValueError("mixture targets must be positive")
    if weight_col is not None and weight_col not in frame.df.columns:
        raise ValueError(
            f"weight_col {weight_col!r} is not in the frame "
            f"({frame.df.columns})"
        )
    mass = (
        F.count("*")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("double"))
    )
    tmap = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in (kv[0], float(kv[1]))]
    )
    counts = (
        frame.df.groupBy(group_col)
        .agg(mass.alias("__cnt"))
        .withColumn("__tgt", tmap[F.col(group_col)])
        .filter(F.col("__tgt").isNotNull())
    )
    # max feasible kept-total T keeps ALL of the binding group:
    # T = min over groups of cnt / tgt; per-group keep rate tgt*T/cnt.
    tmin = counts.agg(F.min(F.col("__cnt") / F.col("__tgt")).alias("__T"))
    # The binding group's rate is exactly 1.0 in real arithmetic but can
    # evaluate to 0.999... in floating point; the epsilon + clamp keeps
    # the docstring's "keeps every row of the binding group" guarantee
    # (mirrored in the mixture_resample oracle SQL).
    rates = counts.crossJoin(F.broadcast(tmin)).withColumn(
        "__thresh",
        F.least(
            F.floor(
                F.col("__tgt") * F.col("__T") / F.col("__cnt") * GRANULARITY
                + F.lit(1e-9)
            ),
            F.lit(GRANULARITY),
        ).cast("long"),
    )
    out = (
        frame.df.join(
            F.broadcast(rates.select(group_col, "__thresh")),
            on=group_col,
            how="inner",
        )
        .filter(hash_bucket(F.col(id_col), salt) < F.col("__thresh"))
        .drop("__thresh")
    )
    return Frame(out, frame.group_vars())
