"""set_names / glimpse / filter_mask / grouped mutate / salted agg."""

import pandas as pd
import pytest

from cuplyr_spark import agg as A
from cuplyr_spark import from_pandas
from cuplyr_spark.operators.skew import salted_summarise


def test_set_names(spark):
    t = from_pandas(spark, pd.DataFrame({"a": [1], "b": [2]})).group_by("b")
    out = t.set_names("x", "y")
    assert out.columns == ["x", "y"]
    assert out.group_vars() == ("y",)
    with pytest.raises(ValueError):
        t.set_names("only_one")


def test_glimpse_prints(spark, capsys):
    from_pandas(spark, pd.DataFrame({"a": [1, 2], "s": ["x", "y"]})).glimpse()
    out = capsys.readouterr().out
    assert "$ a" in out and "<bigint>" in out and "x, y" in out


def test_filter_mask(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [10, 20, 30]}))
    out = t.filter_mask([True, False, True]).collect()
    assert sorted(out["x"]) == [10, 30]


def test_grouped_mutate_window(spark):
    t = from_pandas(
        spark, pd.DataFrame({"g": ["a", "a", "b"], "x": [1.0, 3.0, 10.0]})
    )
    out = (
        t.group_by("g")
        .mutate(m=A.mean("x"), n=A.n())
        .collect()
        .sort_values(["g", "x"])
    )
    assert out["m"].tolist() == [2.0, 2.0, 10.0]
    assert out["n"].tolist() == [2, 2, 1]
    # ungrouped frame: AggSpec becomes a whole-table window value
    out2 = t.mutate(m=A.mean("x")).collect()
    assert out2["m"].round(4).tolist() == [4.6667, 4.6667, 4.6667]


def test_salted_summarise_matches_plain(spark):
    pdf = pd.DataFrame(
        {
            "k": ["hot"] * 50 + ["a", "b"] * 5,
            "v": list(range(50)) + list(range(10)),
        }
    )
    t = from_pandas(spark, pdf)
    got = (
        salted_summarise(
            t, ["k"], n_salts=4,
            total=("sum", "v"), n=("count", None),
            mn=("min", "v"), mx=("max", "v"), avg=("mean", "v"),
        )
        .collect()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pdf.groupby("k")["v"]
        .agg(total="sum", n="count", mn="min", mx="max", avg="mean")
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for c in ["total", "n", "mn", "mx"]:
        assert got[c].tolist() == want[c].tolist()
    assert got["avg"].tolist() == pytest.approx(want["avg"].tolist())


def test_salted_summarise_rejects_nonassociative(spark):
    t = from_pandas(spark, pd.DataFrame({"k": ["a"], "v": [1]}))
    with pytest.raises(ValueError):
        salted_summarise(t, ["k"], bad=("median", "v"))


def test_cube_rollup(spark):
    pdf = pd.DataFrame(
        {"a": ["x", "x", "y"], "b": ["p", "q", "p"], "v": [1, 2, 4]}
    )
    t = from_pandas(spark, pdf)
    cube = t.cube("a", "b").summarise(s=A.sum("v")).collect()
    assert len(cube) == 8  # 3 leaf + 2 per-a + 2 per-b + grand total
    assert cube[cube.a.isna() & cube.b.isna()].s.iloc[0] == 7
    roll = t.rollup("a", "b").summarise(s=A.sum("v")).collect()
    assert len(roll) == 6  # 3 leaf + 2 per-a + grand total
    assert roll[roll.a.isna()].s.iloc[0] == 7
    # group_by after cube resets to plain groupby
    plain = t.cube("a").group_by("a").summarise(s=A.sum("v")).collect()
    assert len(plain) == 2


def test_nest_unnest_roundtrip(spark):
    pdf = pd.DataFrame(
        {"g": ["a", "a", "b"], "x": [2, 1, 3], "y": ["u", "v", "w"]}
    )
    t = from_pandas(spark, pdf)
    nested = t.group_by("g").nest()
    assert nested.columns == ["g", "data"]
    row = {r["g"]: r["data"] for r in nested.collect_rows()}
    assert [d["x"] for d in row["a"]] == [1, 2]  # sorted => deterministic
    flat = nested.unnest("data").arrange("g", "x").collect()
    assert list(flat.x) == [1, 2, 3]
    assert list(flat.columns) == ["g", "x", "y"]


def test_slice_head_tail(spark):
    pdf = pd.DataFrame({"g": ["a", "a", "a", "b"], "ts": [3, 1, 2, 9], "v": [30, 10, 20, 90]})
    t = from_pandas(spark, pdf).group_by("g")
    head = t.slice_head(2, order_by="ts").arrange("g", "ts").collect()
    assert list(head.v) == [10, 20, 90]
    tail = t.slice_tail(2, order_by="ts").arrange("g", "ts").collect()
    assert list(tail.v) == [20, 30, 90]
    # ungrouped: global order + limit
    u = from_pandas(spark, pdf).slice_head(1, order_by="-ts").collect()
    assert list(u.v) == [90]


def test_rename_with_and_complete(spark):
    pdf = pd.DataFrame({"G": ["a", "a"], "Day": [1, 2], "v": [10.0, 20.0]})
    t = from_pandas(spark, pdf).group_by("G")
    r = t.rename_with(str.lower)
    assert r.columns == ["g", "day", "v"]
    assert r.group_vars() == ("g",)
    # complete: (a,1),(a,2) present; b absent entirely -> no b rows to expand
    pdf2 = pd.DataFrame({"g": ["a", "a", "b"], "day": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
    c = from_pandas(spark, pdf2).complete("g", "day", fill={"v": 0.0}).arrange("g", "day").collect()
    assert len(c) == 4  # {a,b} x {1,2}
    assert c[(c.g == "b") & (c.day == 2)].v.iloc[0] == 0.0


def test_tally_add_count_n_groups(spark):
    import pandas as pd

    from cuplyr_spark import from_pandas

    t = from_pandas(
        spark, pd.DataFrame({"g": ["a", "a", "b"], "v": [1, 2, 3]})
    ).group_by("g")
    out = t.tally().collect().sort_values("g").reset_index(drop=True)
    assert out["n"].tolist() == [2, 1]
    ac = t.add_count().collect().sort_values("v")
    assert ac["n"].tolist() == [2, 2, 1]
    assert t.n_groups() == 2
    assert from_pandas(spark, pd.DataFrame({"x": [1]})).n_groups() == 1


def test_slice_sample(spark):
    import pandas as pd

    from cuplyr_spark import from_pandas

    t = from_pandas(spark, pd.DataFrame({"x": list(range(100))}))
    got = t.slice_sample(n=10).collect()
    assert len(got) == 10 and got["x"].is_unique
    # seeded -> deterministic
    a = t.slice_sample(n=5, seed=7).collect()["x"].tolist()
    b = t.slice_sample(n=5, seed=7).collect()["x"].tolist()
    assert a == b
    frac = t.slice_sample(fraction=0.5, seed=1).collect()
    assert 20 <= len(frac) <= 80
    import pytest

    with pytest.raises(ValueError):
        t.slice_sample()


def test_salted_join_matches_plain_join(spark):
    from cuplyr_spark import from_pandas
    from cuplyr_spark.operators.skew import salted_join
    import pandas as pd

    # skewed left: 900 of 1000 rows share key 7
    left = from_pandas(
        spark,
        pd.DataFrame(
            {"k": [7] * 900 + list(range(100)), "v": range(1000)}
        ),
    )
    right = from_pandas(
        spark, pd.DataFrame({"k": range(100), "name": [f"n{i}" for i in range(100)]})
    )
    salted = salted_join(left, right, by=["k"], n_salts=8).collect()
    plain = left.inner_join(right, by="k").collect()
    key = lambda d: sorted(map(tuple, d[["k", "v", "name"]].itertuples(index=False)))
    assert key(salted) == key(plain)
    assert len(salted) == 1000
    # left join keeps unmatched rows (none here; drop key 7 from right)
    keep = [i for i in range(100) if i != 7]
    right_small = from_pandas(
        spark, pd.DataFrame({"k": keep, "name": [f"n{i}" for i in keep]})
    )
    lj = salted_join(left, right_small, by=["k"], how="left", n_salts=8).collect()
    assert len(lj) == 1000 and lj.name.isna().sum() == 901  # all 901 sevens


def test_complete_refuses_cardinality_explosion(spark):
    """Scale-guard policy (r5): complete() REFUSES a grid whose
    estimated combination count exceeds max_cells, instead of silently
    building a multiplicative cross join; max_cells=0 forces; NULL
    counts as a grid level in the estimate (tidyr keeps NA)."""
    import pytest

    pdf = pd.DataFrame({"a": range(200), "b": range(200), "v": [1.0] * 200})
    f = from_pandas(spark, pdf)
    with pytest.raises(ValueError, match="exceeds max_cells"):
        f.complete("a", "b", max_cells=10_000)  # 200*200 = 40k > 10k
    forced = f.complete("a", "b", max_cells=0)
    assert len(forced.collect()) == 200 * 200

    # NULL adds one level to the estimate
    pdf2 = pd.DataFrame({"g": [None, "x"], "h": ["p", "q"], "v": [1.0, 2.0]})
    f2 = from_pandas(spark, pdf2)
    with pytest.raises(ValueError, match="exceeds max_cells"):
        f2.complete("g", "h", max_cells=3)  # (1+1 null)*2 = 4 > 3
    assert len(f2.complete("g", "h", max_cells=4).collect()) == 4


def test_group_modify_per_group_pandas(spark):
    import pandas as pd

    from cuplyr_spark import from_pandas

    f = from_pandas(
        spark,
        pd.DataFrame({"g": [1, 1, 1, 2, 2], "v": [1.0, 5.0, 3.0, 2.0, 9.0]}),
    )

    def trimmed_mean(pdf):
        if len(pdf) <= 2:
            return pd.DataFrame({"g": [], "m": []}).astype(
                {"g": "int64", "m": "float64"}
            )
        s = pdf.sort_values("v").iloc[1:-1]
        return pd.DataFrame({"g": [pdf["g"].iloc[0]], "m": [s["v"].mean()]})

    out = f.group_by("g").group_modify(trimmed_mean, "g long, m double").collect()
    assert out.set_index("g")["m"].to_dict() == {1: 3.0}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires group_by"):
        f.group_modify(trimmed_mean, "g long, m double")


def test_profile_one_pass_stats(spark):
    import pandas as pd

    from cuplyr_spark import from_pandas

    f = from_pandas(
        spark,
        pd.DataFrame(
            {
                "x": [1.0, 2.0, None, 2.0],
                "s": ["a", None, None, "b"],
            }
        ),
    )
    out = f.profile().collect().set_index("column")
    assert out.loc["x", "n_nulls"] == 1
    assert out.loc["x", "n_distinct"] == 2
    assert out.loc["x", "min_num"] == 1.0 and out.loc["x", "max_num"] == 2.0
    assert out.loc["s", "n_nulls"] == 2
    assert out.loc["s", "n_distinct"] == 2
    assert pd.isna(out.loc["s", "min_num"])


def test_rows_family_semantics(spark):
    import pandas as pd
    import pytest as _pytest

    from cuplyr_spark import from_pandas

    x = from_pandas(
        spark, pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", None], "w": [1, 2, 3]})
    )
    y = from_pandas(
        spark, pd.DataFrame({"k": [2, 3, 4], "v": ["B", None, "d"], "w": [20, 30, 40]})
    )

    upd = x.rows_update(y, by="k").collect().set_index("k").sort_index()
    assert upd["v"].tolist() == ["a", "B", None]  # y values win, incl. NULL
    assert upd["w"].tolist() == [1, 20, 30]

    pat = x.rows_patch(y, by="k").collect().set_index("k").sort_index()
    assert pat["v"].tolist() == ["a", "b", None]  # only x NULLs filled
    assert pat["w"].tolist() == [1, 2, 3]

    ups = x.rows_upsert(y, by="k").collect().set_index("k").sort_index()
    assert ups.index.tolist() == [1, 2, 3, 4]
    assert ups.loc[4, "v"] == "d"

    ins = x.rows_insert(y, by="k").collect().set_index("k").sort_index()
    assert ins.index.tolist() == [1, 2, 3, 4]
    assert ins.loc[2, "v"] == "b"  # existing keys untouched

    dele = x.rows_delete(y, by="k").collect()
    assert dele["k"].tolist() == [1]

    with _pytest.raises(ValueError, match="already exist"):
        x.rows_insert(y, by="k", conflict="error")

    # patch with a payload-subset y (only v)
    y2 = from_pandas(spark, pd.DataFrame({"k": [3], "v": ["filled"]}))
    pat2 = x.rows_patch(y2, by="k").collect().set_index("k").sort_index()
    assert pat2["v"].tolist() == ["a", "b", "filled"]


def test_rows_family_default_key_is_first_y_column(spark):
    """ADVICE r5 (medium): with by=None the rows_* key defaults to y's
    FIRST column (dplyr's documented default) — NOT a natural join on
    all common columns, which for same-schema frames made the payload
    empty and rows_update a silent no-op."""
    x = from_pandas(
        spark, pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    y = from_pandas(spark, pd.DataFrame({"k": [2, 9], "v": ["B", "z"]}))

    upd = x.rows_update(y).collect().set_index("k").sort_index()
    assert upd["v"].tolist() == ["a", "B", "c"]  # k=2 actually updated

    ups = x.rows_upsert(y).collect().set_index("k").sort_index()
    assert ups["v"].tolist() == ["a", "B", "c", "z"]

    dele = x.rows_delete(y).collect()
    assert sorted(dele["k"].tolist()) == [1, 3]

    ins = x.rows_insert(y).collect()
    assert sorted(ins["k"].tolist()) == [1, 2, 3, 9]


def test_rows_update_empty_payload_raises(spark):
    """Explicit by= covering every column leaves nothing to merge —
    raise instead of silently returning x unchanged."""
    x = from_pandas(spark, pd.DataFrame({"k": [1], "v": ["a"]}))
    y = from_pandas(spark, pd.DataFrame({"k": [1], "v": ["B"]}))
    with pytest.raises(ValueError, match="no non-key"):
        x.rows_update(y, by=["k", "v"])


def test_profile_quoted_column_name(spark):
    """ADVICE r5: a column name containing a single quote must survive
    the stack() literal interpolation (the old escape was a no-op)."""
    pdf = pd.DataFrame({"it's": [1, 2, None], "b": ["x", "y", "z"]})
    f = from_pandas(spark, pdf)
    prof = f.profile().collect().set_index("column")
    assert set(prof.index) == {"it's", "b"}
    assert int(prof.loc["it's", "n_nulls"]) == 1
    assert int(prof.loc["it's", "n_distinct"]) == 2


def test_nest_join_name_collision_raises(spark):
    """ADVICE r5: nest_join(name=) colliding with a left column would
    produce two same-named columns with ambiguous resolution."""
    left = from_pandas(spark, pd.DataFrame({"k": [1], "y": ["taken"]}))
    right = from_pandas(spark, pd.DataFrame({"k": [1, 1], "val": [10, 20]}))
    with pytest.raises(ValueError, match="collides"):
        left.nest_join(right, by="k", name="y")
    out = left.nest_join(right, by="k", name="packed").collect()
    assert len(out.loc[0, "packed"]) == 2


def test_group_modify_largest_group_advisory(spark):
    """VERDICT r5 item 8: the one Arrow escape hatch gets the same
    estimate-and-warn guard as broadcast() — a degenerate single-group
    frame over a tiny threshold must warn (and still compute)."""
    import warnings as w

    import pyspark.sql.functions as F

    pdf = pd.DataFrame({"g": [1] * 500, "v": list(range(500))})
    f = from_pandas(spark, pdf).group_by("g")

    def head1(d):
        return d.head(1)

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        out = f.group_modify(head1, "g long, v long", max_group_bytes=64).collect()
    assert len(out) == 1
    assert any("largest group" in str(r.message) for r in rec)

    # under the threshold -> no probe, no warning
    with w.catch_warnings(record=True) as rec2:
        w.simplefilter("always")
        f.group_modify(head1, "g long, v long").collect()
    assert not [r for r in rec2 if "largest group" in str(r.message)]


def test_separate_rows(spark):
    import pandas as pd
    from cuplyr_spark import from_pandas

    f = from_pandas(
        spark,
        pd.DataFrame(
            {"id": [1, 2, 3], "tags": ["a,b,c", "d", None], "n": ["1,2,3", "4", None]}
        ),
    )
    out = f.separate_rows("tags").collect()
    assert list(out["tags"]) == ["a", "b", "c", "d", None]
    # lockstep multi-column split + numeric convert
    out2 = (
        from_pandas(
            spark, pd.DataFrame({"id": [1], "a": ["x,y"], "b": ["10,20"]})
        )
        .separate_rows("b", sep=",", convert=True)
        .collect()
    )
    assert list(out2["b"]) == [10, 20]


def test_uncount(spark):
    import pandas as pd
    from cuplyr_spark import from_pandas

    f = from_pandas(
        spark,
        pd.DataFrame({"g": ["a", "b", "c", "d"], "w": [2, 0, 1, None]}),
    )
    out = f.uncount("w", id_col="copy").arrange("g", "copy").collect()
    assert list(out["g"]) == ["a", "a", "c"]
    assert list(out["copy"]) == [1, 2, 1]
    # integer literal weight
    assert len(f.uncount(2).collect()) == 8
