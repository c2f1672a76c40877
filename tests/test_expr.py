"""Expression-compiler tests (cuplyr_spark.functions.expr): the
R-style grammar of the reference's mutate/filter parsers
(``R/mutate.R:180-394``, ``R/filter.R:137-244``) plus the SQL
fallback."""

import pandas as pd
import pytest

from cuplyr_spark import from_pandas


@pytest.fixture(scope="module")
def t(spark):
    return from_pandas(
        spark,
        pd.DataFrame(
            {"a": [4.0, 9.0, -2.5], "b": [2.0, 3.0, 2.0], "s": ["x", "y", "z"]}
        ),
    )


def test_power_is_r_semantics(t):
    """`^` must be POWER, not Spark SQL's XOR."""
    out = t.mutate(p="a ^ 2").collect()
    assert out["p"].tolist() == [16.0, 81.0, 6.25]
    out2 = t.mutate(p="a ** 2").collect()
    assert out2["p"].tolist() == [16.0, 81.0, 6.25]


def test_mod_and_floordiv(t):
    out = t.mutate(m="a % b", fd="a // b").collect()
    assert out["m"].tolist() == [0.0, 0.0, -0.5]
    assert out["fd"].tolist() == [2.0, 3.0, -2.0]


def test_nested_arithmetic(t):
    out = t.mutate(x="(a + b) * 2 - 1").collect()
    assert out["x"].tolist() == [11.0, 23.0, -2.0]


def test_functions_r_names(t):
    out = t.mutate(
        r=("round(a)"),
        c="ceiling(b / 2)",
        f="floor(a)",
        sq="sqrt(abs(a))",
        tr="trunc(a)",
    ).collect()
    assert out["c"].tolist() == [1.0, 2.0, 1.0]
    assert out["tr"].tolist() == [4.0, 9.0, -2.0]  # toward zero


def test_boolean_and_in(t):
    out = t.filter("a > 0 and b == 2.0").collect()
    assert len(out) == 1
    out2 = t.filter("s in ['x', 'z']").collect()
    assert sorted(out2["s"]) == ["x", "z"]
    out3 = t.filter("not (a > 0)").collect()
    assert out3["a"].tolist() == [-2.5]


def test_if_else(t):
    out = t.mutate(sign="if_else(a >= 0, 'pos', 'neg')").collect()
    assert out["sign"].tolist() == ["pos", "pos", "neg"]


def test_chained_comparison(t):
    out = t.filter("0 < a < 5").collect()
    assert out["a"].tolist() == [4.0]


def test_sql_fallback(t):
    """Invalid Python but valid Spark SQL goes through F.expr."""
    out = t.mutate(c="CAST(a AS INT)").collect()
    assert out["c"].tolist() == [4, 9, -2]


def test_string_functions(t):
    out = t.mutate(u="upper(s)", l2="length(s)").collect()
    assert out["u"].tolist() == ["X", "Y", "Z"]
    assert out["l2"].tolist() == [1, 1, 1]


def test_is_na(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [1.0, None]}))
    out = t.mutate(na="is_na(x)").collect()
    assert out["na"].tolist() == [False, True]


def test_stringr_verbs(spark):
    t = from_pandas(spark, pd.DataFrame({"s": ["Customer#042 AUTO", "plain text"]}))
    out = t.mutate(
        num="str_extract(s, '([0-9]+)')",
        auto="str_detect(s, 'AUTO')",
        first3="str_sub(s, 1, 3)",
        clean="str_remove_all(s, '[0-9]')",
        nt="str_count(s, 't')",
        repl="str_replace_all(s, ' ', '_')",
    ).collect()
    assert out["num"].tolist() == ["042", ""]
    assert out["auto"].tolist() == [True, False]
    assert out["first3"].tolist() == ["Cus", "pla"]
    assert out["clean"].tolist() == ["Customer# AUTO", "plain text"]
    assert out["nt"].tolist() == [1, 2]
    assert out["repl"].tolist() == ["Customer#042_AUTO", "plain_text"]


def test_str_replace_first_match(spark):
    """R stringr::str_replace replaces only the FIRST occurrence
    (str_replace_all replaces every one)."""
    t = from_pandas(spark, pd.DataFrame({"s": ["a-b-c", "no dash", "xx"]}))
    out = t.mutate(
        one="str_replace(s, '-', '_')",
        all="str_replace_all(s, '-', '_')",
        rm="str_remove(s, 'x')",
        # group refs shift transparently: \1 in R is the user's group
        backref="str_replace(s, '([a-z])-([a-z])', '\\\\2-\\\\1')",
        dollar="str_replace(s, 'x', '$')",
    ).collect()
    assert out["one"].tolist() == ["a_b-c", "no dash", "xx"]
    assert out["all"].tolist() == ["a_b_c", "no dash", "xx"]
    assert out["rm"].tolist() == ["a-b-c", "no dash", "x"]
    assert out["backref"].tolist() == ["b-a-c", "no dash", "xx"]
    assert out["dollar"].tolist() == ["a-b-c", "no dash", "$x"]


def test_str_replace_anchored_and_empty_pattern(spark):
    t = from_pandas(spark, pd.DataFrame({"s": ["abc", "zabc"]}))
    out = t.mutate(
        anchored="str_replace(s, '^a', '-')",
        star="str_replace(s, 'q*', '-')",
    ).collect()
    # ^ inside the pattern still means start-of-string
    assert out["anchored"].tolist() == ["-bc", "zabc"]
    # empty-matching pattern replaces once at position 0 (R behavior)
    assert out["star"].tolist() == ["-abc", "-zabc"]


def test_coercions_and_cast(spark):
    t = from_pandas(spark, pd.DataFrame({"x": [1.7, -2.7], "s": ["3", "4"]}))
    out = t.mutate(
        i="as_integer(x)", n="as_numeric(s)", c="as_character(x)",
        l="cast(s, 'bigint')",
    ).collect()
    assert out["i"].tolist() == [1, -2]
    assert out["n"].tolist() == [3.0, 4.0]
    assert out["l"].tolist() == [3, 4]
    assert out["c"].dtype == object


def test_date_verbs(spark):
    t = from_pandas(spark, pd.DataFrame({"d": pd.to_datetime(["1995-03-17", "1996-12-01"])}))
    out = t.mutate(
        y="year(d)", m="month(d)", dom="mday(d)", doy="yday(d)",
        ms="floor_date(d, 'month')",
    ).collect()
    assert out["y"].tolist() == [1995, 1996]
    assert out["dom"].tolist() == [17, 1]
    assert out["doy"].tolist() == [76, 336]
    assert [str(v)[:10] for v in out["ms"]] == ["1995-03-01", "1996-12-01"]


def test_quantile_aggs(spark):
    from cuplyr_spark import agg as A

    t = from_pandas(spark, pd.DataFrame({"g": ["a"] * 5, "x": [1.0, 2.0, 3.0, 4.0, 100.0]}))
    out = t.group_by("g").summarise(
        p50=A.quantile("x", 0.5),
        p90=A.approx_quantile("x", 0.9),
    ).collect()
    assert out["p50"].tolist() == [3.0]
    assert out["p90"].iloc[0] in (4.0, 100.0)  # sketch: rank-error bounded


def test_str_replace_backref_edge_cases(spark):
    """Escape-aware group-ref shifting (ADVICE r2): literal backslashes
    pass through, multi-digit refs bind longest-valid like a regex
    engine, and \\0 / out-of-range refs are rejected."""
    from cuplyr_spark.functions.expr import _shift_group_refs

    # escaped literal backslash before a digit is literal text, not a ref
    assert _shift_group_refs("(a)", "\\\\1") == "\\\\1"
    # 1-group pattern: \10 binds as group 1 + literal "0" (Java reparses
    # $20 the same way: longest valid group, then literal)
    assert _shift_group_refs("(a)", "\\10") == "$20"
    # 10-group pattern: \10 binds the full two digits, shifted to $11
    assert _shift_group_refs("(a)" * 10, "\\10") == "$11"
    # $ in the replacement is literal for the user, escaped for Java
    assert _shift_group_refs("a", "$5") == "\\$5"
    with pytest.raises(ValueError):
        _shift_group_refs("(a)", "\\0")
    with pytest.raises(ValueError):
        _shift_group_refs("(a)", "\\2")


def test_str_replace_whole_match_ref_rejected(spark):
    t = from_pandas(spark, pd.DataFrame({"s": ["ab"]}))
    with pytest.raises(ValueError):
        t.mutate(x="str_replace(s, 'a', '\\\\0')").collect()


def test_dplyr_vector_helpers(spark):
    """na_if / replace_na / between / pmin / pmax in the R-style
    grammar, checked against their dplyr definitions."""
    t = from_pandas(
        spark,
        pd.DataFrame(
            {
                "x": pd.array([1, 2, None, 4], dtype="Int64"),
                "y": pd.array([2, 2, 3, 3], dtype="Int64"),
            }
        ),
    )
    out = t.mutate(
        nil="na_if(x, 2)",            # 2 -> NULL
        filled="replace_na(x, 0)",    # NULL -> 0
        inside="between(x, 2, 4)",
        lo="pmin(x, y)",
        hi="pmax(x, y)",
    ).collect()
    assert out["nil"].tolist()[1] is None or pd.isna(out["nil"].tolist()[1])
    assert out["nil"][0] == 1 and out["nil"][3] == 4
    assert out["filled"].tolist() == [1, 2, 0, 4]
    got_inside = [None if pd.isna(v) else bool(v) for v in out["inside"]]
    assert got_inside == [False, True, None, True]
    # R pmin/pmax propagate NA (na.rm=FALSE) — row 2 must be NA, not 3
    assert pd.isna(out["lo"][2]) and pd.isna(out["hi"][2])
    assert [v for i, v in enumerate(out["lo"]) if i != 2] == [1, 2, 3]
    assert [v for i, v in enumerate(out["hi"]) if i != 2] == [2, 2, 4]


def test_stringr_round5_aliases(spark):
    import pandas as pd

    from cuplyr_spark import from_pandas

    f = from_pandas(
        spark, pd.DataFrame({"s": ["  a   b  ", "ab", "abcdef"]})
    )
    out = f.mutate(
        sq="str_squish(s)",
        pl="str_pad(s, 5, 'left', '.')",
        pr="str_pad(s, 5, 'right', '.')",
        pb="str_pad(s, 5, 'both', '.')",
        dup="str_dup(s, 2)",
        title="str_to_title(s)",
    ).collect()
    assert out["sq"].tolist() == ["a b", "ab", "abcdef"]
    # stringr: pad to width, never truncate
    assert out["pl"].tolist()[1:] == ["...ab", "abcdef"]
    assert out["pr"].tolist()[1:] == ["ab...", "abcdef"]
    assert out["pb"].tolist()[1:] == [".ab..", "abcdef"]  # floor-left
    assert out["dup"].tolist()[1] == "abab"
    assert out["title"].tolist()[1] == "Ab"
