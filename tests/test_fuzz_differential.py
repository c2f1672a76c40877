"""Property-based differential fuzzing: random small frames + random
verb pipelines, Spark vs DuckDB. Exceeds the reference's test strategy
(it had no property-based tests, SURVEY §5).

Kept deliberately small (tiny frames, bounded examples, one shared
session) so the suite stays fast; the value is in the RANDOM SHAPES —
NULL placement, empty groups, negative values, boundary predicates —
not in volume.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cuplyr_spark import agg as A
from cuplyr_spark import from_pandas
from tests.helpers import assert_frame_matches

finite_doubles = st.one_of(
    st.none(),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ).map(lambda x: round(x, 3)),
)
small_ints = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
keys = st.sampled_from(["a", "b", "c"])


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    return pd.DataFrame(
        {
            "g": [draw(keys) for _ in range(n)],
            "x": pd.array([draw(small_ints) for _ in range(n)], dtype="Int64"),
            "y": pd.array([draw(finite_doubles) for _ in range(n)], dtype="Float64"),
        }
    )


FUZZ_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


SCHEMA = "g string, x bigint, y double"


def mk(spark, pdf: pd.DataFrame, schema: str = SCHEMA):
    return from_pandas(spark, pdf, schema=schema)


def run_duck(pdf: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", pdf)
    out = con.execute(sql).fetchdf()
    con.close()
    return out


@given(pdf=frames(), threshold=st.integers(min_value=-50, max_value=50))
@FUZZ_SETTINGS
def test_fuzz_filter(spark, pdf, threshold):
    got = mk(spark, pdf).filter(f"x > {threshold}").collect()
    want = run_duck(pdf, f"SELECT * FROM t WHERE x > {threshold}")
    assert_frame_matches(got, want)


@given(pdf=frames())
@FUZZ_SETTINGS
def test_fuzz_grouped_agg(spark, pdf):
    got = (
        mk(spark, pdf)
        .group_by("g")
        .summarise(
            s=A.sum("x"),
            n=A.n(),
            c=A.count("y"),
            mn=A.min("y"),
            mx=A.max("x"),
        )
        .collect()
    )
    want = run_duck(
        pdf,
        """SELECT g, sum(x) AS s, count(*) AS n, count(y) AS c,
                  min(y) AS mn, max(x) AS mx
           FROM t GROUP BY g""",
    )
    assert_frame_matches(got, want)


@given(pdf=frames())
@FUZZ_SETTINGS
def test_fuzz_mutate_arithmetic(spark, pdf):
    got = (
        mk(spark, pdf)
        .mutate(z="x * 2 + 1", w="y / 2", m="x % 7")
        .select("g", "z", "w", "m")
        .collect()
    )
    want = run_duck(
        pdf,
        "SELECT g, x * 2 + 1 AS z, y / 2 AS w, x % 7 AS m FROM t",
    )
    assert_frame_matches(got, want)


@given(pdf=frames(), pdf2=frames())
@FUZZ_SETTINGS
def test_fuzz_join_null_keys(spark, pdf, pdf2):
    """Null-safe join semantics under random NULL patterns: dplyr
    na_matches='na' == SQL IS NOT DISTINCT FROM."""
    l = mk(spark, pdf)
    r = mk(spark, pdf2.rename(columns={"y": "y2", "g": "g2"}),
           "g2 string, x bigint, y2 double")
    got = (
        l.inner_join(r, by="x")
        .select("g", "x", "y", "g2", "y2")
        .collect()
    )
    con = duckdb.connect()
    con.register("l", pdf)
    con.register("r", pdf2.rename(columns={"y": "y2", "g": "g2"}))
    want = con.execute(
        """SELECT l.g, l.x, l.y, r.g2, r.y2
           FROM l JOIN r ON l.x IS NOT DISTINCT FROM r.x"""
    ).fetchdf()
    con.close()
    assert_frame_matches(got, want)


@given(pdf=frames(), pdf2=frames())
@FUZZ_SETTINGS
def test_fuzz_bind_rows(spark, pdf, pdf2):
    got = mk(spark, pdf).bind_rows(mk(spark, pdf2)).collect()
    want = run_duck(
        pd.concat([pdf, pdf2], ignore_index=True)[["g", "x", "y"]],
        "SELECT * FROM t",
    )
    assert_frame_matches(got, want)


@st.composite
def short_key_frames(draw):
    """Frames whose group keys are NULLABLE smallints — the packed-key
    aggregation path with sentinel bits (16+16+2 = 34 bits)."""
    n = draw(st.integers(min_value=0, max_value=14))
    small = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
    return pd.DataFrame(
        {
            "k1": pd.array([draw(small) for _ in range(n)], dtype="Int16"),
            "k2": pd.array([draw(small) for _ in range(n)], dtype="Int16"),
            "y": pd.array([draw(finite_doubles) for _ in range(n)], dtype="Float64"),
        }
    )


@given(pdf=short_key_frames())
@FUZZ_SETTINGS
def test_fuzz_packed_nullable_key_agg(spark, pdf):
    """Packed-key aggregation with nullable smallint keys must match
    DuckDB's composite group-by exactly — NULL keys their own groups,
    NULL-vs-0 never merged, negatives restored by the sign-extending
    unpack."""
    f = mk(spark, pdf, schema="k1 smallint, k2 smallint, y double")
    frame = f.group_by("k1", "k2")
    got_frame = frame.summarise(s=A.sum("y"), n=A.n())
    if len(pdf):
        # path actually engaged (both keys smallint + sentinel bits fit)
        assert "__cuplyr_pk__" in got_frame.df._jdf.queryExecution().analyzed().toString()
    got = got_frame.collect()
    got["k1"] = got["k1"].astype("Int64")
    got["k2"] = got["k2"].astype("Int64")
    want = run_duck(
        pdf,
        "SELECT CAST(k1 AS BIGINT) AS k1, CAST(k2 AS BIGINT) AS k2, "
        "sum(y) AS s, count(*) AS n FROM t GROUP BY k1, k2",
    )
    assert_frame_matches(got, want)


@st.composite
def paragraph_corpora(draw):
    """Docs assembled from a SMALL paragraph pool so cross-document
    duplicates are common; includes empty paragraphs."""
    pool = ["alpha beta", "gamma", "delta epsilon zeta", "", "eta theta"]
    n_docs = draw(st.integers(min_value=1, max_value=6))
    rows = []
    for i in range(n_docs):
        k = draw(st.integers(min_value=1, max_value=4))
        paras = [pool[draw(st.integers(min_value=0, max_value=len(pool) - 1))] for _ in range(k)]
        rows.append((i, "\n".join(paras)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@given(pdf=paragraph_corpora())
@FUZZ_SETTINGS
def test_fuzz_paragraph_dedup(spark, pdf):
    """dedup_paragraphs vs a DuckDB window replay on random corpora
    built from a small paragraph pool (guaranteed cross-doc dups,
    within-doc repeats, empty paragraphs)."""
    from cuplyr_spark.pipeline.dedup import dedup_paragraphs

    f = mk(spark, pdf, schema="doc_id bigint, text string")
    got = dedup_paragraphs(f).collect()
    want = run_duck(
        pdf,
        """
        WITH p AS (
          SELECT doc_id,
                 generate_subscripts(string_split(text, chr(10)), 1) AS pos,
                 unnest(string_split(text, chr(10))) AS para
          FROM t
        ), k AS (
          SELECT doc_id, pos, para,
                 min(doc_id) OVER (PARTITION BY para) AS min_id,
                 min(pos) OVER (PARTITION BY para, doc_id) AS min_pos
          FROM p
        ), reb AS (
          SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text
          FROM k WHERE length(para) < 1 OR (doc_id = min_id AND pos = min_pos)
          GROUP BY doc_id
        )
        SELECT t.doc_id, coalesce(reb.text, '') AS text
        FROM t LEFT JOIN reb USING (doc_id)
        """,
    )
    assert_frame_matches(got, want)


@st.composite
def range_join_inputs(draw):
    """Random events + intervals on the numeric-ms path, with
    degenerate shapes: point intervals (start == end), inverted
    intervals (start > end, must match nothing), empty sides."""
    n_l = draw(st.integers(min_value=0, max_value=10))
    n_r = draw(st.integers(min_value=0, max_value=6))
    ms = st.integers(min_value=0, max_value=50)
    left = pd.DataFrame(
        {
            "lid": range(n_l),
            "k": [draw(keys) for _ in range(n_l)],
            "ts": [draw(ms) * 1000 for _ in range(n_l)],
        }
    )
    starts = [draw(ms) * 1000 for _ in range(n_r)]
    durs = [draw(st.integers(min_value=-10, max_value=20)) * 1000 for _ in range(n_r)]
    right = pd.DataFrame(
        {
            "rid": range(n_r),
            "k": [draw(keys) for _ in range(n_r)],
            "t_start": starts,
            "t_end": [s + d for s, d in zip(starts, durs)],
        }
    )
    return left, right


@given(inputs=range_join_inputs())
@FUZZ_SETTINGS
def test_fuzz_range_join(spark, inputs):
    """Bucketized range join vs DuckDB's direct BETWEEN join on random
    events/intervals — the bucketization (explode + equi-join + exact
    filter) must be invisible."""
    from cuplyr_spark.operators.rangejoin import range_join

    left, right = inputs
    lf = mk(spark, left, schema="lid bigint, k string, ts bigint")
    rf = mk(spark, right, schema="rid bigint, k string, t_start bigint, t_end bigint")
    got = (
        range_join(lf, rf, "ts", "t_start", "t_end", by=["k"], bucket_ms=3000)
        .select("lid", "rid")
        .collect()
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        "SELECT l.lid, r.rid FROM l JOIN r ON l.k = r.k "
        "AND l.ts BETWEEN r.t_start AND r.t_end"
    ).fetchdf()
    assert_frame_matches(got, want)


@st.composite
def asof_inputs(draw):
    """Random click/event frames; right timestamps UNIQUE per key so
    the as-of match is well-defined in every engine (pandas breaks
    equal-right-ts ties by input order, Spark's window has no stable
    order among identical sort keys)."""
    n_l = draw(st.integers(min_value=0, max_value=10))
    ms = st.integers(min_value=0, max_value=40)
    left = pd.DataFrame(
        {
            "lid": pd.Series(range(n_l), dtype="int64"),
            "k": pd.Series([draw(keys) for _ in range(n_l)], dtype="object"),
            "ts": pd.Series([draw(ms) for _ in range(n_l)], dtype="int64"),
        }
    )
    rights = []
    rid = 0
    for k in ["a", "b", "c"]:
        n_k = draw(st.integers(min_value=0, max_value=5))
        ts_pool = draw(
            st.lists(ms, min_size=n_k, max_size=n_k, unique=True)
        )
        for t in ts_pool:
            rights.append((rid, k, t))
            rid += 1
    right = pd.DataFrame(rights, columns=["rid", "k", "ts"]).astype(
        {"rid": "int64", "k": "object", "ts": "int64"}
    )
    return left, right


@given(inputs=asof_inputs(), direction=st.sampled_from(["backward", "forward", "nearest"]))
@FUZZ_SETTINGS
def test_fuzz_asof_directions(spark, inputs, direction):
    """asof_join vs pandas.merge_asof on random frames, all three
    directions."""
    from cuplyr_spark.operators.asof import asof_join

    left, right = inputs
    lf = mk(spark, left, schema="lid bigint, k string, ts bigint")
    rf = mk(spark, right, schema="rid bigint, k string, ts bigint")
    got = (
        asof_join(lf, rf, by="k", on="ts", direction=direction)
        .select("lid", "rid")
        .collect()
    )
    lp = left.sort_values("ts", kind="mergesort").reset_index(drop=True)
    rp = right.sort_values("ts", kind="mergesort").reset_index(drop=True)
    want = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)[
        ["lid", "rid"]
    ]
    assert_frame_matches(got, want)


def test_chunk_documents_reconstruction_property(spark):
    """Property: dropping each chunk's leading `overlap` chars (except
    chunk 0) and concatenating reconstructs the original text exactly,
    for arbitrary text lengths around the stride boundaries."""
    import pandas as pd

    from cuplyr_spark import from_pandas
    from cuplyr_spark.pipeline.text import chunk_documents

    size, overlap = 40, 10
    texts = [
        ("x" * 0), ("a" * 29), ("b" * 30), ("c" * 31), ("d" * 40),
        ("e" * 41), ("f" * 100), ("g" * 99),
        "".join(chr(97 + i % 26) for i in range(137)),
    ]
    f = from_pandas(
        spark,
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    out = chunk_documents(f, size=size, overlap=overlap).collect()
    for doc_id, text in enumerate(texts):
        chunks = (
            out[out.doc_id == doc_id]
            .sort_values("chunk_id")["chunk_text"]
            .tolist()
        )
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == text, (doc_id, len(text))
        # every chunk except the last is full-size
        assert all(len(c) == size for c in chunks[:-1])


def test_normalize_url_differential_vs_duckdb(spark, duck):
    """The entry oracle replays normalize_url as a DuckDB regex chain;
    fuzz the chain equivalence over adversarial URL shapes (ports,
    multiple tracking params, params before/after real ones, no-path
    hosts, mixed-case schemes)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from cuplyr_spark import from_pandas
    from cuplyr_spark.pipeline.text import normalize_url

    urls = [
        "HTTP://WWW.A.COM",
        "http://a.com/",
        "https://A.com:8080/P?utm_a=1&x=2&utm_b=3#f",
        "ftp://www.Files.NET/Dir/File.TXT",
        "https://a.com/p?x=1&utm_source=t",
        "https://a.com/p?utm_source=t&x=1",
        "https://a.com/p?gclid=abc",
        "https://a.com/p?fbclid=1&gclid=2",
        "https://www.a.com/www.b.com/Path",
        "https://a.com/p#frag#frag2",
        "https://a.com/trailing/",
        "noscheme/just/a/path?utm_x=1",
    ]
    f = from_pandas(spark, pd.DataFrame({"url": urls}))
    got = {
        r["url"]: r["n"]
        for r in f.df.withColumn("n", normalize_url(F.col("url"))).collect()
    }
    chain = """
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        concat(
          regexp_replace(lower(regexp_extract(u0, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*', 0)),
                         '://www\\.', '://', 'g'),
          substr(u0, length(regexp_extract(u0, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*', 0)) + 1)
        ),
        '&(utm_[a-zA-Z0-9_]*|gclid|fbclid)=[^&#]*', '', 'g'),
        '\\?(utm_[a-zA-Z0-9_]*|gclid|fbclid)=[^&#]*&', '?', 'g'),
        '\\?(utm_[a-zA-Z0-9_]*|gclid|fbclid)=[^&#]*$', '', 'g'),
        '[?&]$', '', 'g'),
        '/$', '', 'g')
    """
    for url in urls:
        want = duck.execute(
            f"SELECT {chain} FROM (SELECT regexp_replace(?, '#.*', '', 'g') AS u0)",
            [url],
        ).fetchone()[0]
        assert got[url] == want, (url, got[url], want)


def test_rows_family_differential_vs_duckdb(spark):
    """rows_update/patch/upsert/delete vs the equivalent DuckDB SQL
    over randomized keyed frames (fixed seeds; NULLs in payloads,
    partial key overlap)."""
    import duckdb as _dd
    import numpy as np
    import pandas as pd

    from cuplyr_spark import from_pandas

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        xk = rng.choice(np.arange(20), size=12, replace=False)
        yk = rng.choice(np.arange(25), size=10, replace=False)
        xpdf = pd.DataFrame(
            {
                "k": xk,
                "v": [
                    None if rng.rand() < 0.3 else f"x{i}" for i in range(len(xk))
                ],
                "w": rng.randint(0, 100, size=len(xk)),
            }
        )
        ypdf = pd.DataFrame(
            {
                "k": yk,
                "v": [
                    None if rng.rand() < 0.3 else f"y{i}" for i in range(len(yk))
                ],
                "w": rng.randint(100, 200, size=len(yk)),
            }
        )
        x, y = from_pandas(spark, xpdf), from_pandas(spark, ypdf)
        con = _dd.connect()
        con.register("x", xpdf)
        con.register("y", ypdf)

        def norm(pdf):
            return (
                pdf.assign(v=pdf["v"].astype(object).where(pdf["v"].notna(), None))
                .sort_values(["k"])
                .reset_index(drop=True)[["k", "v", "w"]]
                .astype({"k": "int64", "w": "int64"})
            )

        got_u = norm(x.rows_update(y, by="k").collect())
        want_u = norm(
            con.execute(
                """SELECT x.k,
                          CASE WHEN y.k IS NOT NULL THEN y.v ELSE x.v END AS v,
                          CASE WHEN y.k IS NOT NULL THEN y.w ELSE x.w END AS w
                   FROM x LEFT JOIN y USING (k)"""
            ).fetchdf()
        )
        pd.testing.assert_frame_equal(got_u, want_u, check_dtype=False)

        got_p = norm(x.rows_patch(y, by="k").collect())
        want_p = norm(
            con.execute(
                """SELECT x.k,
                          CASE WHEN y.k IS NOT NULL THEN coalesce(x.v, y.v) ELSE x.v END AS v,
                          x.w AS w
                   FROM x LEFT JOIN y USING (k)"""
            ).fetchdf()
        )
        pd.testing.assert_frame_equal(got_p, want_p, check_dtype=False)

        got_s = norm(x.rows_upsert(y, by="k").collect())
        want_s = norm(
            con.execute(
                """SELECT x.k,
                          CASE WHEN y.k IS NOT NULL THEN y.v ELSE x.v END AS v,
                          CASE WHEN y.k IS NOT NULL THEN y.w ELSE x.w END AS w
                   FROM x LEFT JOIN y USING (k)
                   UNION ALL
                   SELECT k, v, w FROM y WHERE k NOT IN (SELECT k FROM x)"""
            ).fetchdf()
        )
        pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)

        got_d = norm(x.rows_delete(y, by="k").collect())
        want_d = norm(
            con.execute(
                "SELECT * FROM x WHERE k NOT IN (SELECT k FROM y)"
            ).fetchdf()
        )
        pd.testing.assert_frame_equal(got_d, want_d, check_dtype=False)
