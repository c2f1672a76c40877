"""Sketch layer (operators/sketch.py): mergeable HLL distinct
sketches, approx/exact distinct, heavy hitters.

The load-bearing assertions are the algebraic ones a 100 TB pipeline
relies on: sketch merge is LOSSLESS (union of per-shard sketches
estimates exactly what one whole-data sketch estimates — bitwise the
same registers), deterministic across runs, and the estimate error
stays inside the DataSketches bound at real cardinalities. Exactness
claims (heavy hitters, exact mode) are differential vs pandas."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.operators.sketch import (
    approx_distinct,
    distinct_sketch,
    heavy_hitters,
    merge_distinct_sketches,
)


@pytest.fixture(scope="module")
def keys(spark):
    # 60k rows, ~20k distinct keys, zipf-ish repetition, 6 groups
    df = spark.range(60_000).select(
        (F.col("id") % 6).alias("g"),
        (
            F.when(F.col("id") % 3 == 0, F.col("id") % 50)  # hot keys
            .otherwise(F.xxhash64("id") % 20_000)
        ).alias("k"),
    )
    return Frame(df, ())


def test_exact_mode_matches_count_distinct(spark, keys):
    got = (
        approx_distinct(keys, "k", by="g", exact=True)
        .collect()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = (
        keys.df.groupBy("g")
        .agg(F.count_distinct("k").alias("n_distinct"))
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_approx_within_rsd_bound(spark, keys):
    ex = approx_distinct(keys, "k", by="g", exact=True).collect()
    ap = approx_distinct(keys, "k", by="g", rsd=0.02).collect()
    m = ex.merge(ap, on="g", suffixes=("_ex", "_ap"))
    rel = (m["n_distinct_ap"] - m["n_distinct_ex"]).abs() / m["n_distinct_ex"]
    # 4 sigma on the requested 2% rsd
    assert (rel <= 0.08).all(), m


def test_sketch_merge_is_lossless(spark, keys):
    """Union of per-shard sketches == one whole-data sketch — the
    property that makes sketch-per-ingest-shard sound."""
    sharded = Frame(keys.df.withColumn("shard", F.col("k") % 7), ())
    per_shard = distinct_sketch(sharded, "k", by=["g", "shard"], lgk=12)
    merged = (
        merge_distinct_sketches(per_shard, "sketch", by="g")
        .collect()
        .sort_values("g")
        .reset_index(drop=True)
    )
    whole = (
        merge_distinct_sketches(
            distinct_sketch(keys, "k", by="g", lgk=12), "sketch", by="g"
        )
        .collect()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert merged["n_distinct_est"].tolist() == whole["n_distinct_est"].tolist()


def test_sketch_estimate_within_bound_and_deterministic(spark, keys):
    ex = approx_distinct(keys, "k", by="g", exact=True).collect()
    sk1 = merge_distinct_sketches(
        distinct_sketch(keys, "k", by="g", lgk=14), "sketch", by="g"
    ).collect()
    sk2 = merge_distinct_sketches(
        distinct_sketch(keys, "k", by="g", lgk=14), "sketch", by="g"
    ).collect()
    pd.testing.assert_frame_equal(
        sk1.sort_values("g").reset_index(drop=True),
        sk2.sort_values("g").reset_index(drop=True),
    )
    m = ex.merge(sk1, on="g")
    rel = (m["n_distinct_est"] - m["n_distinct"]).abs() / m["n_distinct"]
    # lgk=14 -> rse ~0.8%; allow 4 sigma
    assert (rel <= 0.033).all(), m


def test_incremental_fold_continues(spark, keys):
    """keep_sketch=True lets yesterday's merged sketch absorb today's
    shard sketch — the running-stat update never rescans history."""
    # pmod: k can be negative (xxhash64 remainder), and `k % 2 = 1`
    # would silently drop the negative odds from both days
    day1 = Frame(keys.df.filter("pmod(k, 2) = 0"), ())
    day2 = Frame(keys.df.filter("pmod(k, 2) = 1"), ())
    s1 = merge_distinct_sketches(
        distinct_sketch(day1, "k", by="g"), "sketch", by="g", keep_sketch=True
    )
    rolled = merge_distinct_sketches(
        Frame(
            s1.df.select("g", "sketch").unionByName(
                distinct_sketch(day2, "k", by="g").df
            ),
            (),
        ),
        "sketch",
        by="g",
    ).collect()
    whole = merge_distinct_sketches(
        distinct_sketch(keys, "k", by="g"), "sketch", by="g"
    ).collect()
    m = rolled.merge(whole, on="g", suffixes=("_roll", "_whole"))
    assert (m["n_distinct_est_roll"] == m["n_distinct_est_whole"]).all()


def test_heavy_hitters_exact_and_tiebreak(spark):
    pdf = pd.DataFrame({"v": ["b"] * 5 + ["a"] * 5 + ["c"] * 3 + ["d"]})
    fr = Frame(spark.createDataFrame(pdf), ())
    got = heavy_hitters(fr, "v", k=3).collect()
    # count desc, value asc on ties: a(5), b(5), c(3)
    assert got["v"].tolist() == ["a", "b", "c"]
    assert got["n"].tolist() == [5, 5, 3]


def test_heavy_hitters_grouped_and_min_count(spark):
    pdf = pd.DataFrame(
        {
            "g": [1] * 6 + [2] * 6,
            "v": ["x", "x", "y", "y", "y", "z", "p", "p", "p", "q", "q", "r"],
        }
    )
    fr = Frame(spark.createDataFrame(pdf), ())
    got = heavy_hitters(fr, "v", k=2, by="g").collect()
    top = {
        g: list(sub.sort_values(["n", "v"], ascending=[False, True])["v"])
        for g, sub in got.groupby("g")
    }
    assert top == {1: ["y", "x"], 2: ["p", "q"]}
    floor = heavy_hitters(fr, "v", k=5, min_count=2).collect()
    assert "r" not in floor["v"].tolist() and "z" not in floor["v"].tolist()


def test_heavy_hitters_validates_k(spark):
    fr = Frame(spark.range(3), ())
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(fr, "id", k=0)


def test_sketch_plan_shape(spark, keys):
    """The sketch aggregate must partial-aggregate (ObjectHashAggregate
    partial + final around one exchange) — sketch bytes on the wire,
    not keys."""
    df = distinct_sketch(keys, "k", by="g").df
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "hll_sketch_agg" in plan


def test_streaming_sketch_table(spark, tmp_path):
    """The running-statistics recipe end-to-end: a stream's batches
    each land ONE sketch row per group in an append table
    (foreachBatch → distinct_sketch → append_snapshot, exactly-once
    via the per-app watermark); any reader merges the stored sketches
    for the corpus-wide distinct count — no raw key is ever stored,
    and the estimate matches the all-data exact count. The same
    pattern keyed on append-log versions gives rescan-free stats over
    a growing 100 TB table."""
    import os

    import pandas as pd

    from cuplyr_spark.sources.connectors import (
        append_snapshot,
        read_append_snapshot,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    table = str(tmp_path / "sketches")
    ckpt = str(tmp_path / "ckpt")
    pd.DataFrame({"g": [0, 0, 1, 1], "u": [1, 2, 10, 11]}).to_parquet(
        f"{src}/b0.parquet", index=False
    )
    # u=2 repeats across batches: distinct must not double-count it
    pd.DataFrame({"g": [0, 1, 1], "u": [2, 11, 12]}).to_parquet(
        f"{src}/b1.parquet", index=False
    )

    def land(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        sk = distinct_sketch(Frame(batch_df, ()), "u", by="g", lgk=12)
        append_snapshot(sk, table, batch_id=batch_id, app_id="stats")

    q = (
        spark.readStream.schema("g long, u long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    stored = read_append_snapshot(spark, table)
    est = (
        merge_distinct_sketches(stored, "sketch", by="g")
        .collect()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # exact: g=0 -> {1,2}, g=1 -> {10,11,12}
    assert est["n_distinct_est"].tolist() == [2, 3]


def test_sketch_validates_lgk_and_count_col(spark):
    fr = Frame(spark.range(3), ())
    with pytest.raises(ValueError, match="lgk"):
        distinct_sketch(fr, "id", lgk=3)
    with pytest.raises(ValueError, match="count_col"):
        heavy_hitters(fr, "id", k=1, count_col="id")


# -- mergeable histogram sketches -----------------------------------------


def _hist_pdf(seed=7, n=6000):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, 3, n),
            "shard": rng.integers(0, 4, n),
            "x": rng.normal(50, 15, n).clip(0, 100),
        }
    )


def test_histogram_merge_is_exact(spark):
    """Union of per-shard histograms == whole-data histogram, bin for
    bin — the property that lets running distributions be maintained
    per append-table segment without rescans."""
    from cuplyr_spark import from_pandas
    from cuplyr_spark.operators.sketch import (
        histogram_sketch,
        merge_histogram_sketches,
    )

    fr = from_pandas(spark, _hist_pdf())
    per = histogram_sketch(fr, "x", lo=0.0, hi=100.0, bins=128,
                           by=["g", "shard"])
    merged = merge_histogram_sketches(per, by="g")
    whole = histogram_sketch(fr, "x", lo=0.0, hi=100.0, bins=128, by="g")
    mm = {r["g"]: r["hist"] for r in merged.df.collect()}
    wm = {r["g"]: r["hist"] for r in whole.df.collect()}
    assert mm == wm
    assert all(len(h) == 128 for h in mm.values())


def test_histogram_quantile_error_bound(spark):
    """Every estimate is within one bin width of the true quantile —
    the deterministic contract the fixed binning buys (no sampling, no
    probabilistic bound)."""
    import numpy as np

    from cuplyr_spark import from_pandas
    from cuplyr_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
        merge_histogram_sketches,
    )

    pdf = _hist_pdf(seed=11)
    fr = from_pandas(spark, pdf)
    per = histogram_sketch(fr, "x", lo=0.0, hi=100.0, bins=200,
                           by=["g", "shard"])
    q = histogram_quantiles(
        merge_histogram_sketches(per, by="g"), [0.1, 0.5, 0.9, 0.99],
        by="g",
    )
    width = 100.0 / 200
    for r in q.df.collect():
        sub = pdf[pdf.g == r["g"]]["x"]
        for p, est in zip([0.1, 0.5, 0.9, 0.99], r["q"]):
            true = float(np.quantile(sub, p))
            assert abs(est - true) <= width + 1e-9, (r["g"], p, est, true)


def test_histogram_ungrouped_and_edges(spark):
    """Ungrouped path; out-of-range values clamp to edge bins; NULLs
    excluded; empty-group quantiles are NULL not an error."""
    import pandas as pd

    from cuplyr_spark import from_pandas
    from cuplyr_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )

    pdf = pd.DataFrame({"x": [-5.0, 0.0, 5.0, 9.99, 50.0, None]})
    fr = from_pandas(spark, pdf)
    h = histogram_sketch(fr, "x", lo=0.0, hi=10.0, bins=10)
    row = h.df.collect()[0]
    assert sum(row["hist"]) == 5  # NULL excluded
    assert row["hist"][0] == 2    # -5 clamps into bin 0 with 0.0
    assert row["hist"][9] == 2    # 9.99 in-range + 50 clamps into last
    q = histogram_quantiles(h, [0.5]).df.collect()[0]["q"]
    assert q[0] is not None

    empty = histogram_sketch(
        from_pandas(spark, pd.DataFrame({"x": [None]})).mutate(
            x="x * 1.0"
        ),
        "x", lo=0.0, hi=1.0, bins=4,
    )
    # no rows survive the null filter: the ungrouped (global) sketch is
    # one all-zeros row, and its quantiles are NULL rather than an error
    row = empty.df.collect()[0]
    assert row["hist"] == [0, 0, 0, 0]
    assert histogram_quantiles(empty, [0.5]).df.collect()[0]["q"][0] is None


def test_histogram_guards(spark):
    import pandas as pd
    import pytest as _pytest

    from cuplyr_spark import from_pandas
    from cuplyr_spark.frame import Frame
    from cuplyr_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
        merge_histogram_sketches,
    )

    fr = from_pandas(spark, pd.DataFrame({"x": [1.0, 2.0]}))
    with _pytest.raises(ValueError, match="bins"):
        histogram_sketch(fr, "x", lo=0.0, hi=1.0, bins=0)
    with _pytest.raises(ValueError, match="hi > lo"):
        histogram_sketch(fr, "x", lo=1.0, hi=1.0)
    with _pytest.raises(ValueError, match="fractions"):
        histogram_quantiles(fr, [1.5], hist_col="x")
    a = histogram_sketch(fr, "x", lo=0.0, hi=1.0, bins=8)
    b = histogram_sketch(fr, "x", lo=0.0, hi=2.0, bins=8)
    mixed = Frame(a.df.unionByName(b.df), ())
    with _pytest.raises(Exception, match="mixed binning"):
        merge_histogram_sketches(mixed).df.collect()
