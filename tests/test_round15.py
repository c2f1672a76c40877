"""Round-15 fixes (ADVICE closures).

ADVICE closures:
- high: ``update_append_rows(schema_mode='merge')`` now enforces the
  same retired_names guard ``append_snapshot`` / ``upsert_append_rows``
  enforce — assigning a NEW column whose name was previously renamed
  away or dropped refuses instead of silently resurrecting the old
  physical bytes in pre-change segments.
- low: the upsert key-set broadcast bound (``known_bytes``) measures
  real max byte widths for variable-width key columns in the same
  batch-count aggregate, instead of assuming 64 bytes per string — a
  key set of long URLs / composite hashes no longer under-estimates
  by orders of magnitude and force-broadcasts past the guard.
- low: ``http_if_none_match_put`` inspects the 409 body — only the
  documented conditional-write conflict codes (S3
  ConditionalRequestConflict, Azure BlobAlreadyExists) or an empty
  body count as a CAS loss; other 409s (OperationAborted,
  bucket-state conflicts) re-raise instead of melting into an
  indefinite rebase-retry loop.
- low: ``chunk_documents_tokens`` coalesces NULL text to the empty
  string, so NULL documents yield one single-empty-token chunk (the
  documented contract) instead of silently vanishing.

The reference has no storage layer (SURVEY.md §2.1); these designs
are public art (Delta log) rebuilt jar-free."""

from __future__ import annotations

import io

import pytest
from pyspark.sql import functions as F

import cuplyr_spark.sources.connectors as C
from cuplyr_spark.frame import Frame
from cuplyr_spark.sources.connectors import (
    append_snapshot,
    read_append_snapshot,
    rename_append_column,
    update_append_rows,
    upsert_append_rows,
)


# -- update merge refuses retired names (ADVICE high) ----------------------


def test_update_merge_refuses_retired_name(spark, tmp_path):
    d = str(tmp_path / "t")
    df = spark.range(6).select(F.col("id"), (F.col("id") * 2).alias("a"))
    append_snapshot(Frame(df, ()), d, batch_id=0)
    rename_append_column(d, "a", "b", spark)
    # backfilling a column named like the retired one would make
    # _conform_schema read the pre-rename segments' physical 'a'
    # bytes as the "new" column — refuse exactly like append/upsert
    with pytest.raises(ValueError, match="renamed away or dropped"):
        update_append_rows(
            spark, d, "id >= 3", {"a": "id + 100"}, schema_mode="merge"
        )
    # a genuinely fresh name still merges fine
    v, n = update_append_rows(
        spark, d, "id >= 3", {"c": "id + 100"}, schema_mode="merge"
    )
    assert n == 3
    got = read_append_snapshot(spark, d).collect()
    assert sorted(got.columns) == ["b", "c", "id"]
    assert sorted(
        got.loc[got["c"].notna(), "c"].astype(int).tolist()
    ) == [103, 104, 105]


def test_update_merge_refuses_dropped_name(spark, tmp_path):
    from cuplyr_spark.sources.connectors import drop_append_column

    d = str(tmp_path / "t")
    df = spark.range(4).select(
        F.col("id"), F.col("id").alias("x"), F.lit("k").alias("y")
    )
    append_snapshot(Frame(df, ()), d, batch_id=0)
    drop_append_column(d, "y", spark)
    with pytest.raises(ValueError, match="renamed away or dropped"):
        update_append_rows(
            spark, d, "id < 2", {"y": "'resurrected'"}, schema_mode="merge"
        )


# -- upsert key broadcast bound measures string widths (ADVICE low) --------


def test_est_row_bytes_measured_widths():
    # defaults: 16 overhead + 64 per string
    assert C._est_row_bytes(["string"]) == 16 + 64
    # a measured width replaces the default (plus 8 offset/len bytes)
    assert C._est_row_bytes(["string"], widths=[500]) == 16 + 508
    # None entries fall back per-column
    assert C._est_row_bytes(
        ["string", "int"], widths=[200, None]
    ) == 16 + 208 + 4
    # fixed-width types keep their table widths when unmeasured
    assert C._est_row_bytes(["bigint", "decimal(38,2)"]) == 16 + 8 + 16


def test_upsert_known_bytes_uses_real_key_widths(spark, tmp_path,
                                                 monkeypatch):
    import cuplyr_spark.frame as frame_mod

    d = str(tmp_path / "t")
    long_key = "u" * 400  # a URL-ish key far past the 64-byte default
    base = spark.createDataFrame(
        [(long_key + str(i), i) for i in range(50)], "k string, v int"
    )
    append_snapshot(Frame(base, ()), d, batch_id=0)

    seen = {}
    real = frame_mod.broadcast_guarded

    def spy(df, what="", known_bytes=None, **kw):
        if "key set" in what:
            seen["kb"] = known_bytes
        return real(df, what=what, known_bytes=known_bytes, **kw)

    monkeypatch.setattr(frame_mod, "broadcast_guarded", spy)
    batch = spark.createDataFrame(
        [(long_key + str(i), i * 10) for i in range(40, 60)],
        "k string, v int",
    )
    upsert_append_rows(Frame(batch, ()), d, key="k")
    # 20 rows × ≥(400+overhead) measured bytes — the 64-byte default
    # would have said 20 × 80 = 1.6 kB; the measured bound must
    # reflect the real ~400-byte keys
    assert seen["kb"] >= 20 * 400
    got = read_append_snapshot(spark, d).collect()
    assert len(got) == 60  # 50 base − 10 replaced + 20 batch


# -- 409 body inspection (ADVICE low) --------------------------------------


def _http_error(code, body=b""):
    import urllib.error

    return urllib.error.HTTPError(
        "http://store.invalid/k", code, "x", None, io.BytesIO(body)
    )


@pytest.mark.parametrize(
    "body",
    [
        b"",
        b"<Error><Code>ConditionalRequestConflict</Code></Error>",
        b"<Error><Code>BlobAlreadyExists</Code></Error>",
        b"<Error><Code>PreconditionFailed</Code></Error>",
    ],
)
def test_conditional_put_409_race_codes_are_cas_losses(monkeypatch, body):
    import urllib.request

    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda req, timeout=None: (_ for _ in ()).throw(
            _http_error(409, body)
        ),
    )
    assert C.http_if_none_match_put("http://store.invalid/k", "{}") is False


def test_conditional_put_409_store_errors_surface(monkeypatch):
    import urllib.error
    import urllib.request

    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda req, timeout=None: (_ for _ in ()).throw(
            _http_error(
                409, b"<Error><Code>OperationAborted</Code></Error>"
            )
        ),
    )
    with pytest.raises(urllib.error.HTTPError):
        C.http_if_none_match_put("http://store.invalid/k", "{}")


# -- chunking keeps NULL-text documents (ADVICE low) -----------------------


def test_chunk_documents_tokens_null_text(spark):
    from cuplyr_spark.pipeline.text import chunk_documents_tokens

    df = spark.createDataFrame(
        [("d1", "a b c"), ("d2", None), ("d3", "")],
        "doc_id string, text string",
    )
    out = chunk_documents_tokens(
        Frame(df, ()), chunk_tokens=2, overlap_tokens=0
    ).df.collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # NULL and empty both yield exactly one single-empty-token chunk
    for doc in ("d2", "d3"):
        assert len(by_doc[doc]) == 1
        assert by_doc[doc][0]["chunk_idx"] == 0
        assert by_doc[doc][0]["n_chunk_tokens"] == 1
        assert by_doc[doc][0]["chunk_text"] == ""
    assert [r["chunk_text"] for r in sorted(
        by_doc["d1"], key=lambda r: r["chunk_idx"]
    )] == ["a b", "c"]


# -- non-scalar columns through the storage layer (verdict #1) -------------


def _nested_src(spark, n=40):
    return spark.range(n).select(
        F.col("id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias(
            "media"
        ),
        F.struct(
            (F.col("id") * 7 % 50).cast("int").alias("n_chars"),
            F.lit("utf-8").alias("codec"),
        ).alias("meta"),
        F.array(
            F.concat(F.lit("t"), F.col("id")), F.lit("x")
        ).alias("toks"),
        F.array(
            (F.col("id") * 0.5).cast("double"),
            (F.col("id") * 1.5).cast("double"),
        ).alias("emb"),
    )


def test_nested_columns_full_lifecycle(spark, tmp_path):
    from cuplyr_spark.sources.connectors import (
        append_snapshot,
        compact_append_snapshot,
        delete_append_rows,
        read_append_changes,
        read_append_snapshot,
        restore_append_snapshot,
    )

    d = str(tmp_path / "t")
    src = _nested_src(spark)
    append_snapshot(Frame(src.filter("id % 2 = 0"), ()), d, batch_id=0)
    # additive evolution: a scalar column joins alongside the nested ones
    append_snapshot(
        Frame(src.filter("id % 2 = 1").withColumn("tag", F.lit("b1")), ()),
        d, batch_id=1, schema_mode="merge",
    )
    # merge-on-read DV delete by a STRUCT-FIELD predicate
    v, n_del = delete_append_rows(spark, d, "meta.n_chars < 14")
    assert n_del == len([i for i in range(40) if (i * 7) % 50 < 14])
    # compaction folds the DVs through a nested-preserving rewrite
    compact_append_snapshot(spark, d)
    got = read_append_snapshot(spark, d).df
    rows = {r["id"]: r for r in got.collect()}
    expect_ids = {i for i in range(40) if (i * 7) % 50 >= 14}
    assert set(rows) == expect_ids
    for i, r in rows.items():
        assert bytes(r["media"]) == f"payload-{i}".encode()
        assert r["meta"]["n_chars"] == (i * 7) % 50
        assert r["meta"]["codec"] == "utf-8"
        assert list(r["toks"]) == [f"t{i}", "x"]
        assert list(r["emb"]) == [i * 0.5, i * 1.5]
        assert r["tag"] == ("b1" if i % 2 else None)
    # the change feed sees nested rows era-free
    ch = read_append_changes(spark, d, 0, 2).df
    assert ch.count() == 40
    # restore to the pre-delete version brings every nested row back
    restore_append_snapshot(spark, d, 2)
    assert read_append_snapshot(spark, d).df.count() == 40


def test_nested_columns_upsert_and_update(spark, tmp_path):
    from cuplyr_spark.sources.connectors import (
        append_snapshot,
        read_append_snapshot,
        update_append_rows,
        upsert_append_rows,
    )

    d = str(tmp_path / "t")
    append_snapshot(Frame(_nested_src(spark, 20), ()), d, batch_id=0)
    # keyed MERGE replaces nested payloads wholesale
    batch = _nested_src(spark, 30).filter("id >= 15").withColumn(
        "media", F.encode(F.lit("new"), "utf-8")
    )
    upsert_append_rows(Frame(batch, ()), d, key="id")
    got = {r["id"]: r for r in read_append_snapshot(spark, d).df.collect()}
    assert len(got) == 30
    assert bytes(got[16]["media"]) == b"new"
    assert bytes(got[3]["media"]) == b"payload-3"
    # row-level UPDATE can rewrite a nested column via expression
    v, n = update_append_rows(
        spark, d, "id < 3", {"emb": "array(9.9)"}
    )
    assert n == 3
    got2 = {r["id"]: r for r in read_append_snapshot(spark, d).df.collect()}
    assert list(got2[1]["emb"]) == [9.9]
    assert list(got2[5]["emb"]) == [2.5, 7.5]


def test_nested_refusals_are_typed(spark, tmp_path):
    from cuplyr_spark.sources.connectors import (
        append_snapshot,
        delete_append_rows,
    )

    src = _nested_src(spark, 10)
    for col in ("media", "meta", "toks"):
        with pytest.raises(ValueError, match="non-partitionable"):
            append_snapshot(
                Frame(src, ()), str(tmp_path / f"p_{col}"), batch_id=0,
                partition_by=col,
            )
    with pytest.raises(ValueError, match="non-orderable"):
        append_snapshot(
            Frame(src, ()), str(tmp_path / "c"), batch_id=0,
            cluster_by="meta",
        )
    with pytest.raises(ValueError, match="nested type"):
        append_snapshot(
            Frame(src, ()), str(tmp_path / "s"), batch_id=0,
            sketch_spec={"distinct": ["meta"]},
        )
    d = str(tmp_path / "t")
    append_snapshot(Frame(src, ()), d, batch_id=0)
    # dict-form zone-map filter on a struct path points at the
    # string where= form instead of a bare unknown-column error
    with pytest.raises(ValueError, match="string where form"):
        delete_append_rows(spark, d, {"meta.n_chars": ("<", 14)})


def test_struct_field_predicates_in_frame_verbs(spark):
    df = spark.createDataFrame(
        [(1, (5, "a")), (2, (15, "b"))],
        "id int, meta struct<n:int,s:string>",
    )
    f = Frame(df, ())
    assert [r["id"] for r in f.filter("meta.n > 10").df.collect()] == [2]
    out = f.mutate(n2="meta.n * 2").df.collect()
    assert [r["n2"] for r in out] == [10, 30]
    # a FLAT column whose name contains a dot still wins (join
    # suffixes / bind_cols repairs produce exactly these)
    df2 = spark.createDataFrame([(1, 100), (2, 3)], ["id", "v.x"])
    got = Frame(df2, ()).filter("v.x > 50").df.collect()
    assert [r["id"] for r in got] == [1]
