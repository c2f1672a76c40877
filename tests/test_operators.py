"""Temporal operator tests: sessionize, running sums, time buckets,
as-of join (vs pandas merge_asof as local oracle)."""

import pandas as pd
import pytest

from cuplyr_spark import from_pandas
from cuplyr_spark.operators.asof import asof_join
from cuplyr_spark.operators.events import (
    session_stats,
    sessionize,
    time_bucket_agg,
    with_running_sum,
)
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap > 30min between idx 2 and 3)
        (0, "2024-01-01 10:00:00", 1, 1.0),
        (1, "2024-01-01 10:10:00", 1, 2.0),
        (2, "2024-01-01 10:20:00", 1, 3.0),
        (3, "2024-01-01 12:00:00", 1, 4.0),
        # user 2: single session
        (4, "2024-01-01 09:00:00", 2, 10.0),
        (5, "2024-01-01 09:29:00", 2, 20.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return from_pandas(spark, pdf)


def test_sessionize_gap(events):
    out = sessionize(events, "user_id", "ts", gap_seconds=1800).collect()
    out = out.sort_values("event_id")
    assert out["session_id"].tolist() == [1, 1, 1, 2, 1, 1]


def test_session_stats(events):
    out = session_stats(events, "user_id", "ts", gap_seconds=1800).collect()
    u1 = out[out.user_id == 1].sort_values("session_id")
    assert u1["n_events"].tolist() == [3, 1]
    assert u1["duration_ms"].tolist()[0] == 20 * 60 * 1000


def test_running_sum(events):
    out = with_running_sum(events, "value", "user_id", "ts", "event_id").collect()
    u1 = out[out.user_id == 1].sort_values("event_id")
    assert u1["running_sum"].tolist() == [1.0, 3.0, 6.0, 10.0]


def test_time_bucket_agg(events):
    out = time_bucket_agg(
        events, "ts", "hour", ("user_id",), n=F.count(F.lit(1))
    ).collect()
    u1_10am = out[(out.user_id == 1)].sort_values("bucket_start")
    assert u1_10am["n"].tolist() == [3, 1]


def test_asof_join_matches_pandas(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 60),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 100_000, 60), unit="s"),
            "lv": np.arange(60),
        }
    ).sort_values("ts")
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 40),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 100_000, 40), unit="s"),
            "rv": np.arange(40) * 10,
        }
    ).sort_values("ts")

    want = pd.merge_asof(left, right, on="ts", by="k", direction="backward")

    lf = from_pandas(spark, left)
    rf = from_pandas(spark, right)
    got = (
        asof_join(lf, rf, by="k", on="ts")
        .collect()
        .sort_values(["ts", "lv"])
        .reset_index(drop=True)
    )
    want = want.sort_values(["ts", "lv"]).reset_index(drop=True)
    assert got["lv"].tolist() == want["lv"].tolist()
    got_rv = [None if pd.isna(v) else v for v in got["rv"]]
    want_rv = [None if pd.isna(v) else v for v in want["rv"]]
    assert got_rv == want_rv


def test_asof_join_strict(spark):
    left = pd.DataFrame(
        {"k": [1], "ts": pd.to_datetime(["2024-01-01 10:00:00"]), "lv": [0]}
    )
    right = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 09:00:00"]),
            "rv": [100, 50],
        }
    )
    lf, rf = from_pandas(spark, left), from_pandas(spark, right)
    inclusive = asof_join(lf, rf, by="k", on="ts").collect()
    assert inclusive["rv"].tolist() == [100]  # <= matches equal ts
    strict = asof_join(lf, rf, by="k", on="ts", strict=True).collect()
    assert strict["rv"].tolist() == [50]  # < skips equal ts


def test_asof_join_suffix_on_conflict(spark):
    left = pd.DataFrame(
        {"k": [1], "ts": pd.to_datetime(["2024-01-01"]), "v": [1]}
    )
    right = pd.DataFrame(
        {"k": [1], "ts": pd.to_datetime(["2023-12-31"]), "v": [9]}
    )
    out = asof_join(
        from_pandas(spark, left), from_pandas(spark, right), by="k", on="ts"
    )
    assert "v_right" in out.columns


def test_funnel_strict_ordering(spark):
    from cuplyr_spark.operators.events import funnel

    ts = pd.Timestamp
    rows = [
        # user 1: full funnel in order
        (1, ts("2024-01-01 10:00"), "view"),
        (1, ts("2024-01-01 11:00"), "click"),
        (1, ts("2024-01-01 12:00"), "purchase"),
        # user 2: purchase BEFORE view/click -> stops at stage 2
        (2, ts("2024-01-01 09:00"), "purchase"),
        (2, ts("2024-01-01 10:00"), "view"),
        (2, ts("2024-01-01 11:00"), "click"),
        # user 3: only views
        (3, ts("2024-01-01 10:00"), "view"),
        # user 4: click first then view, click never re-fires -> stage 1
        (4, ts("2024-01-01 09:00"), "click"),
        (4, ts("2024-01-01 10:00"), "view"),
    ]
    f = from_pandas(
        spark, pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    )
    out = (
        funnel(f, ["view", "click", "purchase"]).collect().set_index("user_id")
    )
    assert out.loc[1, "stage"] == 3
    assert out.loc[2, "stage"] == 2 and pd.isna(out.loc[2, "step_3_ts"])
    assert out.loc[3, "stage"] == 1
    assert out.loc[4, "stage"] == 1 and pd.isna(out.loc[4, "step_2_ts"])


def test_retention_cohorts_counts(spark):
    from cuplyr_spark.operators.events import retention_cohorts

    ts = pd.Timestamp
    rows = [
        (1, ts("2024-01-01 10:00")),  # cohort day 0
        (1, ts("2024-01-02 10:00")),  # offset 1
        (1, ts("2024-01-02 18:00")),  # same day, dedup within (user, day)
        (2, ts("2024-01-01 12:00")),  # cohort day 0, never returns
        (3, ts("2024-01-02 12:00")),  # second cohort
        (3, ts("2024-01-04 12:00")),  # offset 2
    ]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["user_id", "ts"]))
    out = retention_cohorts(f).collect()
    got = {
        (str(r.cohort_day), int(r.day_offset)): int(r.n_users)
        for r in out.itertuples()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 2): 1,
    }


def test_rolling_agg_trailing_window(spark):
    from cuplyr_spark.operators.events import with_rolling_agg

    ts = pd.Timestamp
    rows = [
        (1, 1, ts("2024-01-01 00:00:00"), 10.0),
        (2, 1, ts("2024-01-01 00:30:00"), 20.0),
        (3, 1, ts("2024-01-01 01:00:00"), 30.0),  # 00:00 still inside 1h window
        (4, 1, ts("2024-01-01 02:30:00"), 40.0),  # everything else aged out
        (5, 2, ts("2024-01-01 00:45:00"), 5.0),   # other key isolated
    ]
    f = from_pandas(
        spark, pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    )
    out = (
        with_rolling_agg(f, "value", "user_id", "ts", 3600 * 1000)
        .collect()
        .set_index("event_id")
    )
    assert out.loc[1, "rolling_sum"] == 10.0 and out.loc[1, "rolling_n"] == 1
    assert out.loc[2, "rolling_sum"] == 30.0
    assert out.loc[3, "rolling_sum"] == 60.0  # inclusive lower bound
    assert out.loc[4, "rolling_sum"] == 40.0 and out.loc[4, "rolling_n"] == 1
    assert out.loc[5, "rolling_sum"] == 5.0


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_join_directions_match_pandas(spark, direction):
    import numpy as np

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 60),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 100_000, 60), unit="s"),
            "lv": np.arange(60),
        }
    ).sort_values("ts")
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 40),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 100_000, 40), unit="s"),
            "rv": np.arange(40) * 10,
        }
    ).sort_values("ts")
    want = pd.merge_asof(left, right, on="ts", by="k", direction=direction)
    got = (
        asof_join(
            from_pandas(spark, left), from_pandas(spark, right),
            by="k", on="ts", direction=direction,
        )
        .collect()
        .sort_values(["ts", "lv"]).reset_index(drop=True)
    )
    want = want.sort_values(["ts", "lv"]).reset_index(drop=True)
    norm = lambda s: [None if pd.isna(v) else v for v in s]
    assert norm(got["rv"]) == norm(want["rv"])


def test_asof_join_tolerance_matches_pandas(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 50),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 50_000, 50), unit="s"),
            "lv": np.arange(50),
        }
    ).sort_values("ts")
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 30),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 50_000, 30), unit="s"),
            "rv": np.arange(30) * 10,
        }
    ).sort_values("ts")
    tol = pd.Timedelta("30 minutes")
    want = pd.merge_asof(left, right, on="ts", by="k", tolerance=tol)
    got = (
        asof_join(
            from_pandas(spark, left), from_pandas(spark, right),
            by="k", on="ts", tolerance_ms=30 * 60 * 1000,
        )
        .collect()
        .sort_values(["ts", "lv"]).reset_index(drop=True)
    )
    want = want.sort_values(["ts", "lv"]).reset_index(drop=True)
    norm = lambda s: [None if pd.isna(v) else v for v in s]
    assert norm(got["rv"]) == norm(want["rv"])


def test_standardize_known_values(spark):
    from cuplyr_spark.operators.stats import standardize

    rows = [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 5.0), (4, "b", 5.0)]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["id", "g", "x"]))
    out = standardize(f, ["x"], by=["g"]).collect().set_index("id")
    # group a: mean 2, sd sqrt(2) -> z = ±0.707107
    assert out.loc[1, "x_z"] == pytest.approx(-0.707107, abs=1e-6)
    assert out.loc[2, "x_z"] == pytest.approx(0.707107, abs=1e-6)
    # zero-variance group -> NULL, not inf
    assert pd.isna(out.loc[3, "x_z"]) and pd.isna(out.loc[4, "x_z"])


def test_histogram_buckets_and_clamping(spark):
    from cuplyr_spark.operators.stats import histogram

    rows = [(x,) for x in [-5.0, 0.0, 1.5, 2.5, 9.99, 15.0, None]]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["x"]))
    out = histogram(f, "x", bins=5, lo=0.0, hi=10.0).collect()
    got = {int(r.bucket): int(r.n) for r in out.itertuples()}
    # -5 clamps into bucket 0; 15 clamps into bucket 4; None dropped
    assert got == {0: 3, 1: 1, 4: 2}
    b0 = out[out.bucket == 0].iloc[0]
    assert b0.lo == 0.0 and b0.hi == 2.0


def test_rolling_agg_numeric_ms_column(spark):
    """Numeric time columns are epoch-milliseconds, matching the asof /
    range-join convention (ADVICE r2: an unconditional timestamp cast
    read ms as seconds, shrinking the window 1000x)."""
    from cuplyr_spark.operators.events import with_rolling_agg

    h = 3600 * 1000
    rows = [(1, 1, 0, 10.0), (2, 1, h // 2, 20.0), (3, 1, h, 30.0), (4, 1, 5 * h // 2, 40.0)]
    f = from_pandas(
        spark, pd.DataFrame(rows, columns=["event_id", "user_id", "ms", "value"])
    )
    out = (
        with_rolling_agg(f, "value", "user_id", "ms", h)
        .collect()
        .set_index("event_id")
    )
    assert out.loc[2, "rolling_sum"] == 30.0
    assert out.loc[3, "rolling_sum"] == 60.0  # inclusive 1h lower bound
    assert out.loc[4, "rolling_sum"] == 40.0 and out.loc[4, "rolling_n"] == 1


def test_standardize_null_group_key(spark):
    """NULL group keys standardize within the NULL group (null-safe
    moments join), matching window-partition semantics (ADVICE r2)."""
    from cuplyr_spark.operators.stats import standardize

    rows = [(1, "a", 1.0), (2, "a", 3.0), (3, None, 5.0), (4, None, 7.0)]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["id", "g", "x"]))
    out = standardize(f, ["x"], by=["g"]).collect().set_index("id")
    assert out.loc[3, "x_z"] == pytest.approx(-0.707107, abs=1e-6)
    assert out.loc[4, "x_z"] == pytest.approx(0.707107, abs=1e-6)
    assert out.loc[1, "x_z"] == pytest.approx(-0.707107, abs=1e-6)


def test_time_bucket_gapfill(spark):
    from cuplyr_spark.operators.events import time_bucket_gapfill

    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:10",  # hour 0
                    "2024-01-01 03:20",  # hour 3 (gap: 1, 2)
                    "2024-01-01 04:05",  # hour 4
                    "2024-01-01 01:00",  # b: hour 1
                    "2024-01-01 02:30",  # b: hour 2 (no gap)
                ]
            ),
            "v": [10.0, 40.0, 50.0, 7.0, 9.0],
        }
    )
    f = from_pandas(spark, pdf)
    out = time_bucket_gapfill(
        f,
        "ts",
        bucket="hour",
        group_cols=("g",),
        fill={"total": "linear", "n": 0},
        total=F.sum("v"),
        n=F.count(F.lit(1)),
    )
    rows = {
        (r["g"], r["bucket_start"].hour): (r["total"], r["n"])
        for r in out.df.collect()
    }
    # a: hours 0..4 materialized; 1 and 2 linearly interpolated
    assert rows[("a", 0)] == (10.0, 1)
    assert rows[("a", 1)] == (20.0, 0)  # 10 + (40-10) * 1/3
    assert rows[("a", 2)] == (30.0, 0)
    assert rows[("a", 3)] == (40.0, 1)
    assert rows[("a", 4)] == (50.0, 1)
    # b spans only its own range (per_group bounds)
    assert ("b", 0) not in rows and ("b", 3) not in rows
    assert rows[("b", 1)] == (7.0, 1) and rows[("b", 2)] == (9.0, 1)


def test_time_bucket_gapfill_locf_and_global_bounds(spark):
    from cuplyr_spark.operators.events import time_bucket_gapfill

    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 02:00", "2024-01-01 01:00"]
            ),
            "v": [1.0, 3.0, 5.0],
        }
    )
    f = from_pandas(spark, pdf)
    out = time_bucket_gapfill(
        f,
        "ts",
        bucket="hour",
        group_cols=("g",),
        bounds="global",
        fill={"total": "locf"},
        total=F.sum("v"),
    )
    rows = {
        (r["g"], r["bucket_start"].hour): r["total"]
        for r in out.df.collect()
    }
    # global bounds: BOTH groups span hours 0..2 (aligned series)
    assert rows[("a", 1)] == 1.0  # carried forward
    assert rows[("b", 0)] is None  # nothing to carry yet
    assert rows[("b", 2)] == 5.0  # carried forward
    # linear leaves NULL outside the observed range
    out2 = time_bucket_gapfill(
        f,
        "ts",
        bucket="hour",
        group_cols=("g",),
        bounds="global",
        fill={"total": "linear"},
        total=F.sum("v"),
    )
    rows2 = {
        (r["g"], r["bucket_start"].hour): r["total"]
        for r in out2.df.collect()
    }
    assert rows2[("b", 0)] is None and rows2[("b", 2)] is None
    assert rows2[("a", 1)] == 2.0


def test_time_bucket_gapfill_validates_fill_names(spark):
    from cuplyr_spark.operators.events import time_bucket_gapfill

    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01"]), "v": [1.0]}
    )
    with pytest.raises(ValueError, match="not aggregate columns"):
        time_bucket_gapfill(
            from_pandas(spark, pdf),
            "ts",
            fill={"nope": "locf"},
            total=F.sum("v"),
        )


def test_time_bucket_gapfill_explicit_bounds(spark):
    from cuplyr_spark.operators.events import time_bucket_gapfill

    pdf = pd.DataFrame(
        {
            "g": ["a"],
            "ts": pd.to_datetime(["2024-01-01 02:00"]),
            "v": [5.0],
        }
    )
    out = time_bucket_gapfill(
        from_pandas(spark, pdf),
        "ts",
        bucket="hour",
        group_cols=("g",),
        bounds=("2024-01-01 00:00:00", "2024-01-01 04:00:00"),
        fill={"total": 0.0},
        total=F.sum("v"),
    )
    rows = sorted(
        (r["bucket_start"].hour, r["total"]) for r in out.df.collect()
    )
    assert rows == [(0, 0.0), (1, 0.0), (2, 5.0), (3, 0.0), (4, 0.0)]
    with pytest.raises(ValueError, match="bounds"):
        time_bucket_gapfill(
            from_pandas(spark, pdf), "ts", bounds="nonsense",
            total=F.sum("v"),
        )
