"""Window verbs (lag/lead/ranks/cumulatives), case_when, across,
drop_na/replace_na. The reference has no window functions (SURVEY.md
§2.10); these are dplyr-parity extensions."""

import pandas as pd
import pytest

from cuplyr_spark import agg as A
from cuplyr_spark import across, case_when, desc, win
from cuplyr_spark.sources.readers import from_pandas

from tests.conftest import spark  # noqa: F401


@pytest.fixture()
def t(spark):
    return from_pandas(
        spark,
        pd.DataFrame(
            {
                "g": ["a", "a", "a", "b", "b"],
                "ts": [1, 2, 3, 1, 2],
                "x": [10.0, 20.0, 15.0, 5.0, 5.0],
            }
        ),
    )


def test_lag_lead(t):
    out = (
        t.group_by("g")
        .mutate(
            prev=win.lag("x", order_by="ts"),
            nxt=win.lead("x", order_by="ts"),
            prev0=win.lag("x", default=0.0, order_by="ts"),
        )
        .arrange("g", "ts")
        .collect()
    )
    assert list(out.prev)[:3] == [None, 10.0, 20.0] or (
        pd.isna(out.prev.iloc[0]) and list(out.prev[1:3]) == [10.0, 20.0]
    )
    assert pd.isna(out.nxt.iloc[2]) and out.nxt.iloc[0] == 20.0
    assert out.prev0.iloc[0] == 0.0


def test_ranks_and_ntile(t):
    out = (
        t.group_by("g")
        .mutate(
            rk=win.min_rank("x"),
            drk=win.dense_rank(desc("x")),
            rn=win.row_number(order_by=["x", "ts"]),
            tile=win.ntile(2, order_by=["x", "ts"]),
        )
        .arrange("g", "ts")
        .collect()
    )
    a = out[out.g == "a"]
    assert list(a.rk) == [1, 3, 2]
    assert list(a.drk) == [3, 1, 2]
    b = out[out.g == "b"]
    assert list(b.rk) == [1, 1]  # tie shares min rank
    assert sorted(b.rn) == [1, 2]
    assert list(a.tile) == [1, 2, 1]


def test_cumulatives(t):
    out = (
        t.group_by("g")
        .mutate(
            cs=win.cumsum("x", order_by="ts"),
            cm=win.cummax("x", order_by="ts"),
            ca=win.cumall("x > 8", order_by="ts"),
        )
        .arrange("g", "ts")
        .collect()
    )
    a = out[out.g == "a"]
    assert list(a.cs) == [10.0, 30.0, 45.0]
    assert list(a.cm) == [10.0, 20.0, 20.0]
    assert list(a.ca) == [True, True, True]
    assert list(out[out.g == "b"].ca) == [False, False]


def test_ungrouped_window(t):
    out = t.mutate(rk=win.min_rank("x")).collect()
    assert out.rk.max() == 5


def test_case_when_and_across(t):
    out = t.mutate(
        band=case_when(("x >= 15", "high"), ("x >= 10", "mid"), default="low")
    ).collect()
    assert set(out[out.x >= 15].band) == {"high"}
    assert set(out[out.x == 10].band) == {"mid"}
    assert set(out[out.x == 5].band) == {"low"}

    agg = t.group_by("g").summarise(**across(["x", "ts"], mean=A.mean, max=A.max))
    pdf = agg.arrange("g").collect()
    assert list(pdf.columns) == ["g", "x_mean", "x_max", "ts_mean", "ts_max"]
    assert list(pdf.x_max) == [20.0, 5.0]


def test_drop_replace_na(spark, t):
    lagged = t.group_by("g").mutate(prev=win.lag("x", order_by="ts")).ungroup()
    assert lagged.drop_na("prev").dim()[0] == 3
    filled = lagged.replace_na(prev=-1.0).collect()
    assert (filled.prev == -1.0).sum() == 2
    # drop_na() with no args uses all columns
    assert lagged.drop_na().dim()[0] == 3
