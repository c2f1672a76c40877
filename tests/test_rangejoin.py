"""Range-join semantics: containment matching, left null-extension,
multi-interval matches, and the no-cartesian plan guarantee."""

import pandas as pd
import pytest

from cuplyr_spark import from_pandas
from cuplyr_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def sides(spark):
    ts = pd.Timestamp
    left = from_pandas(
        spark,
        pd.DataFrame(
            [
                (1, 1, ts("2024-01-01 10:30")),
                (2, 1, ts("2024-01-01 13:00")),  # matches no interval
                (3, 2, ts("2024-01-01 10:30")),  # other key, overlapping pair
            ],
            columns=["event_id", "k", "ts"],
        ),
    )
    right = from_pandas(
        spark,
        pd.DataFrame(
            [
                (100, 1, ts("2024-01-01 10:00"), ts("2024-01-01 11:00")),
                (101, 2, ts("2024-01-01 10:00"), ts("2024-01-01 11:00")),
                (102, 2, ts("2024-01-01 10:15"), ts("2024-01-01 10:45")),
            ],
            columns=["interval_id", "k", "start", "end"],
        ),
    )
    return left, right


def test_inner_containment(sides):
    left, right = sides
    out = range_join(left, right, "ts", "start", "end", by=["k"]).collect()
    got = sorted((int(r.event_id), int(r.interval_id)) for r in out.itertuples())
    # event 3 matches BOTH overlapping intervals of key 2, exactly once each
    assert got == [(1, 100), (3, 101), (3, 102)]


def test_left_null_extension(sides):
    left, right = sides
    out = range_join(left, right, "ts", "start", "end", by=["k"], how="left").collect()
    assert len(out) == 4  # 3 matches + unmatched event 2
    unmatched = out[out.event_id == 2]
    assert len(unmatched) == 1 and pd.isna(unmatched.interval_id.iloc[0])


def test_no_cartesian_in_plan(sides):
    left, right = sides
    out = range_join(left, right, "ts", "start", "end", by=["k"])
    plan = out.explain_str("formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_overlapping_names_rejected(sides):
    left, right = sides
    bad = right.rename(ts="start")  # collides with left's non-key 'ts'
    with pytest.raises(ValueError, match="rename first"):
        range_join(left, bad, "ts", "ts", "end", by=["k"])
