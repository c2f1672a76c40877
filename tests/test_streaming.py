"""Structured Streaming tests: drive a bounded file-source stream to
completion and check windowed/session aggregations against the batch
equivalents."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuplyr_spark import from_pandas
from cuplyr_spark.streaming.stream import (
    run_to_memory,
    session_agg,
    stream_parquet,
    windowed_agg,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Write a small deterministic event set as the streaming source."""
    d = str(tmp_path_factory.mktemp("stream_src"))
    rows = [
        (0, "2024-01-01 10:00:30", 1, "click", 1.0),
        (1, "2024-01-01 10:02:00", 1, "click", 2.0),
        (2, "2024-01-01 10:07:00", 1, "view", 3.0),
        (3, "2024-01-01 10:00:10", 2, "click", 5.0),
        (4, "2024-01-01 11:00:00", 2, "click", 7.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    from_pandas(spark, pdf).df.coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_windowed_agg_stream(spark, stream_dir):
    src = stream_parquet(spark, stream_dir, SCHEMA)
    assert src.isStreaming
    agg = windowed_agg(
        src,
        "ts",
        window="5 minutes",
        watermark="10 minutes",
        group_cols=("event_type",),
        n=F.count(F.lit(1)),
        total=F.sum("value"),
    )
    run_to_memory(agg, "win_out", output_mode="complete")
    out = spark.sql("SELECT * FROM win_out").toPandas()
    clicks_1000 = out[
        (out.event_type == "click")
        & (out.window_start == pd.Timestamp("2024-01-01 10:00:00"))
    ]
    assert clicks_1000["n"].tolist() == [3]
    assert clicks_1000["total"].tolist() == [8.0]


def test_session_agg_stream_matches_batch(spark, stream_dir):
    src = stream_parquet(spark, stream_dir, SCHEMA)
    agg = session_agg(
        src,
        "ts",
        "user_id",
        gap="30 minutes",
        watermark="2 hours",
        n=F.count(F.lit(1)),
    )
    run_to_memory(agg, "sess_out", output_mode="complete")
    out = spark.sql("SELECT * FROM sess_out").toPandas()
    # user 1: one session of 3; user 2: two sessions (1h apart)
    u1 = out[out.user_id == 1]
    assert u1["n"].tolist() == [3]
    u2 = out[out.user_id == 2].sort_values("session_start")
    assert u2["n"].tolist() == [1, 1]


def test_write_stream_parquet_available_now(spark, stream_dir, tmp_path):
    from cuplyr_spark.streaming.stream import write_stream_parquet

    src = stream_parquet(spark, stream_dir, SCHEMA)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = write_stream_parquet(src.filter(F.col("value") > 2), out_dir, ckpt)
    q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()
    assert sorted(got["value"].tolist()) == [3.0, 5.0, 7.0]


def test_stream_static_join(spark, stream_dir):
    from cuplyr_spark.streaming.stream import stream_static_join

    dim = from_pandas(
        spark,
        pd.DataFrame(
            [("click", 2.0), ("view", 10.0)], columns=["event_type", "weight"]
        ),
    )
    src = stream_parquet(spark, stream_dir, SCHEMA)
    enriched = stream_static_join(src, dim, on="event_type").withColumn(
        "weighted", F.col("value") * F.col("weight")
    )
    assert enriched.isStreaming
    run_to_memory(enriched, "enriched_events")
    out = spark.sql("SELECT * FROM enriched_events").toPandas()
    assert len(out) == 5  # left join keeps every stream row
    got = out.set_index("event_id").weighted
    assert got[0] == 2.0 and got[2] == 30.0 and got[4] == 14.0


# -- unbounded smoke (rate source) --------------------------------------
#
# Every other streaming test drives a BOUNDED file stream to completion;
# these two run a genuinely unbounded rate source for several live
# triggers and assert the two properties that make a stream runnable
# forever: the watermark advances monotonically, and operator state
# stays bounded (here: one flag per key, key space fixed).


def _progress_dicts(query):
    """recentProgress entries as plain dicts across pyspark versions."""
    import json

    out = []
    for p in query.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:
            out.append(json.loads(p.json if isinstance(p.json, str) else p.json()))
    return out


def _await_progress(query, pred, timeout_s=60.0):
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        progs = _progress_dicts(query)
        if pred(progs):
            return progs
        time.sleep(0.5)
    return _progress_dicts(query)


def test_rate_source_dedup_state_bounded(spark):
    """streaming_dedup over an unbounded rate source: state rows never
    exceed the key cardinality (one seen-flag per key), and each key is
    emitted exactly once no matter how many triggers run."""
    from cuplyr_spark.streaming.stateful import streaming_dedup

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 200)
        .load()
        .select(
            (F.col("value") % 7).cast("string").alias("k"),
            F.col("value").alias("event_id"),
        )
    )
    q = (
        streaming_dedup(src, "k", "event_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_dedup")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        progs = _await_progress(
            q,
            lambda ps: sum(1 for p in ps if p.get("numInputRows", 0) > 0) >= 3,
        )
        fed = [p for p in progs if p.get("numInputRows", 0) > 0]
        assert len(fed) >= 3, f"stream never progressed: {len(fed)} data triggers"
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in fed
            if p.get("stateOperators")
        ]
        assert state_rows, "no state operator metrics reported"
        # bounded: never more state than distinct keys
        assert max(state_rows) <= 7, f"state grew past key space: {state_rows}"
    finally:
        q.stop()
    out = spark.sql("SELECT key FROM rate_dedup").toPandas()
    assert set(out["key"]) <= {str(i) for i in range(7)}
    assert len(out) == out["key"].nunique(), "a key was emitted twice"
    assert len(out) >= 1


def test_rate_source_watermark_monotone(spark):
    """Watermarked window agg over an unbounded rate source: the
    watermark starts at epoch and advances monotonically with event
    time — the property that lets Spark finalize windows and evict
    state on an infinite stream."""
    src = spark.readStream.format("rate").option("rowsPerSecond", 100).load()
    agg = (
        src.withWatermark("timestamp", "1 seconds")
        .groupBy(F.window("timestamp", "1 second").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_wm")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def has_two_watermarks(ps):
            wms = {
                p["eventTime"]["watermark"]
                for p in ps
                if p.get("eventTime", {}).get("watermark", "").startswith("2")
            }
            return len(wms) >= 2

        progs = _await_progress(q, has_two_watermarks)
        wms = [
            p["eventTime"]["watermark"]
            for p in progs
            if "watermark" in p.get("eventTime", {})
        ]
        # ISO-8601 UTC strings compare lexicographically as timestamps
        moved = [w for w in wms if w.startswith("2")]  # past the epoch start
        assert len(set(moved)) >= 2, f"watermark never advanced: {wms}"
        assert wms == sorted(wms), f"watermark regressed: {wms}"
    finally:
        q.stop()


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream time-bounded join over a bounded input equals the
    batch join with the same key + range condition."""
    import pandas as pd

    from pyspark.sql import functions as F

    from cuplyr_spark.streaming.stream import run_to_memory, stream_stream_join

    ts = pd.Timestamp("2024-01-01 00:00:00")
    left = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "lid": [10, 11, 12],
            "lts": [ts, ts + pd.Timedelta("2h"), ts],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 2],
            "rid": [20, 21, 22, 23],
            "rts": [
                ts + pd.Timedelta("30min"),   # matches lid=10
                ts + pd.Timedelta("90min"),   # outside 1h of lid=10, before lid=11
                ts + pd.Timedelta("59min"),   # matches lid=12
                ts + pd.Timedelta("61min"),   # outside
            ],
        }
    )
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(left).write.parquet(ldir)
    spark.createDataFrame(right).write.parquet(rdir)
    ls = spark.readStream.schema("k long, lid long, lts timestamp").parquet(ldir)
    rs = spark.readStream.schema("k long, rid long, rts timestamp").parquet(rdir)
    joined = stream_stream_join(
        ls, rs, on="k", left_ts="lts", right_ts="rts", within="1 hour",
        left_watermark="10 days", right_watermark="10 days",
    )
    run_to_memory(joined, "t_ssj")
    got = sorted(
        (r["lid"], r["rid"])
        for r in spark.sql("SELECT * FROM t_ssj").collect()
    )
    assert got == [(10, 20), (12, 22)]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    import pandas as pd

    from cuplyr_spark.streaming.stream import (
        run_to_memory,
        streaming_dedup_within_watermark,
    )

    ts = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 3],
            "ts": [ts, ts + pd.Timedelta("5min"), ts, ts + pd.Timedelta("1min"), ts],
            "v": [1, 2, 3, 4, 5],
        }
    )
    d = str(tmp_path / "in")
    spark.createDataFrame(pdf).write.parquet(d)
    src = spark.readStream.schema("k long, ts timestamp, v long").parquet(d)
    out = streaming_dedup_within_watermark(src, "k", "ts", watermark="10 days")
    run_to_memory(out, "t_ddww")
    got = spark.sql("SELECT k FROM t_ddww").collect()
    assert sorted(r.k for r in got) == [1, 2, 3]  # one survivor per key


def test_stream_upsert_snapshot_merge_sink(spark, tmp_path):
    """Streaming -> snapshot-table MERGE sink: per-microbatch keyed
    upsert with atomic versioned publish. Batch 2 updates a batch-1
    key and inserts a new one; the table's published version reflects
    the merge and time travel still reaches the pre-merge state.
    Replayed keys are idempotent (exactly-once per key)."""
    import os

    import pandas as pd

    from cuplyr_spark.sources.connectors import (
        read_snapshot,
        snapshot_versions,
    )
    from cuplyr_spark.streaming.stream import stream_upsert_snapshot

    src = str(tmp_path / "src")
    os.makedirs(src)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}).to_parquet(
        f"{src}/b0.parquet", index=False
    )
    q = stream_upsert_snapshot(
        spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src),
        table, key="k", checkpoint=ckpt,
    )
    q.awaitTermination()

    got = read_snapshot(spark, table).collect().sort_values("k")
    assert got["v"].tolist() == ["a", "b"]

    # second batch: update k=2, insert k=3 — restart drains only NEW files
    pd.DataFrame({"k": [2, 3], "v": ["B", "c"]}).to_parquet(
        f"{src}/b1.parquet", index=False
    )
    q = stream_upsert_snapshot(
        spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src),
        table, key="k", checkpoint=ckpt,
    )
    q.awaitTermination()

    got = read_snapshot(spark, table).collect().sort_values("k")
    assert got["v"].tolist() == ["a", "B", "c"]
    # one version per non-empty microbatch, all time-travelable
    vers = snapshot_versions(table)
    assert len(vers) >= 2
    first = read_snapshot(spark, table, version=vers[0]).collect()
    assert sorted(first["k"].tolist()) == [1, 2]


def test_stream_upsert_snapshot_auto_compaction(spark, tmp_path):
    """compact_every/vacuum_keep run table maintenance inside the
    foreachBatch slot: after draining two single-file triggers with
    compact_every=1, the published version is compacted to one file
    and vacuum keeps history bounded — rows identical to the plain
    sink's."""
    import os

    import pandas as pd

    from cuplyr_spark.sources.connectors import (
        read_snapshot,
        snapshot_history,
    )
    from cuplyr_spark.streaming.stream import stream_upsert_snapshot

    src = str(tmp_path / "src")
    os.makedirs(src)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}).to_parquet(
        f"{src}/b0.parquet", index=False
    )
    pd.DataFrame({"k": [2, 3], "v": ["B", "c"]}).to_parquet(
        f"{src}/b1.parquet", index=False
    )

    q = stream_upsert_snapshot(
        spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src),
        table, key="k", checkpoint=ckpt,
        compact_every=1, target_file_bytes=1 << 30, vacuum_keep=2,
        zorder_by=["k"],  # forces the real rewrite pass every time
    )
    q.awaitTermination()

    got = read_snapshot(spark, table).collect().sort_values("k")
    assert got["v"].tolist() == ["a", "B", "c"]
    hist = snapshot_history(table)
    # maintenance bounded the history and the published version is a
    # single compacted (z-ordered) file
    assert len(hist) <= 3
    pub = next(r for r in hist if r["published"])
    assert pub["n_files"] == 1 and pub["complete"]


def test_stream_append_snapshot_sink(spark, tmp_path):
    """Append sink: two single-file triggers land as segments, a
    restart with no new input appends nothing (checkpoint), and the
    batch-id watermark blocks double-appends; compact_every folds
    segments inside the sink."""
    import os

    import pandas as pd

    from cuplyr_spark.sources.connectors import (
        _TableFS,
        _read_log,
        read_append_snapshot,
    )
    from cuplyr_spark.streaming.stream import stream_append_snapshot

    src = str(tmp_path / "src")
    os.makedirs(src)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}).to_parquet(
        f"{src}/b0.parquet", index=False
    )
    pd.DataFrame({"k": [3], "v": ["c"]}).to_parquet(
        f"{src}/b1.parquet", index=False
    )

    def run():
        q = stream_append_snapshot(
            spark.readStream.schema("k long, v string").option(
                "maxFilesPerTrigger", 1
            ).parquet(src),
            table, checkpoint=ckpt,
            compact_every=2, target_file_bytes=1 << 30, vacuum_keep=2,
        )
        q.awaitTermination()

    run()
    got = read_append_snapshot(spark, table).collect().sort_values("k")
    assert got["v"].tolist() == ["a", "b", "c"]
    log = _read_log(_TableFS(table))
    assert len(log["segments"]) == 1  # compact_every=2 folded batch 0+1
    assert log["max_batch_id"] == 1

    # restart with no new files: nothing appended, no duplicates
    run()
    assert len(read_append_snapshot(spark, table).collect()) == 3


def test_vacuum_keep_without_compact_every(spark, tmp_path):
    """ADVICE r7: vacuum_keep alone (no compaction schedule) must
    still bound version storage — it runs after every merged batch —
    and zorder_by without compact_every raises instead of being
    silently ignored."""
    import os

    import pandas as pd
    import pytest

    from cuplyr_spark.sources.connectors import snapshot_versions
    from cuplyr_spark.streaming.stream import stream_upsert_snapshot

    src = str(tmp_path / "src")
    os.makedirs(src)
    table = str(tmp_path / "tbl")
    for i in range(4):
        pd.DataFrame({"k": [i], "v": [str(i)]}).to_parquet(
            f"{src}/b{i}.parquet", index=False
        )
    stream = spark.readStream.schema("k long, v string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    with pytest.raises(ValueError, match="zorder_by"):
        stream_upsert_snapshot(
            stream, table, key="k", checkpoint=str(tmp_path / "ck0"),
            zorder_by=["k"],
        )

    q = stream_upsert_snapshot(
        stream, table, key="k", checkpoint=str(tmp_path / "ck1"),
        vacuum_keep=2,
    )
    q.awaitTermination()
    # 4 merged batches published 4 versions; vacuum pruned to <= 2
    assert len(snapshot_versions(table)) <= 2


def test_stream_append_log_tail(spark, tmp_path):
    """Ingest -> curate loop: events land via stream_append_snapshot,
    a downstream query tails them via stream_append_log. Counts match,
    and a tiered compaction between tail runs re-delivers NOTHING
    (fold= segments are outside the tailed glob)."""
    import os

    import pandas as pd

    from cuplyr_spark.sources.connectors import (
        _TableFS,
        _read_log,
        compact_append_snapshot,
    )
    from cuplyr_spark.streaming.stream import (
        run_to_memory,
        stream_append_log,
        stream_append_snapshot,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    table = str(tmp_path / "tbl")
    pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}).to_parquet(
        f"{src}/b0.parquet", index=False
    )
    pd.DataFrame({"k": [3], "v": ["c"]}).to_parquet(
        f"{src}/b1.parquet", index=False
    )
    q = stream_append_snapshot(
        spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src),
        table, checkpoint=str(tmp_path / "ck_in"), app_id="ingest",
    )
    q.awaitTermination()

    tail = stream_append_log(spark, table, "k long, v string")
    run_to_memory(tail, "tail1")
    got = spark.sql("SELECT * FROM tail1").toPandas().sort_values("k")
    assert got["k"].tolist() == [1, 2, 3]

    # compact (fold= segment), then land one more batch
    assert compact_append_snapshot(spark, table, target_file_bytes=1 << 30)
    pd.DataFrame({"k": [4], "v": ["d"]}).to_parquet(
        f"{src}/b2.parquet", index=False
    )
    q = stream_append_snapshot(
        spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src),
        table, checkpoint=str(tmp_path / "ck_in"), app_id="ingest",
    )
    q.awaitTermination()
    log = _read_log(_TableFS(table))
    assert any(s.startswith("fold=") for s in log["segments"])

    # fresh tail over the whole table: raw segments only — the folded
    # copy of rows 1..3 is invisible, so no duplicates
    tail = stream_append_log(spark, table, "k long, v string")
    run_to_memory(tail, "tail2")
    got = spark.sql("SELECT * FROM tail2").toPandas().sort_values("k")
    assert got["k"].tolist() == [1, 2, 3, 4]


def test_stream_upsert_append_mor_sink(spark, tmp_path):
    """Streaming keyed MERGE into an APPEND table (merge-on-read):
    each microbatch DV-marks matched keys and appends the batch — the
    table is never rewritten. Batch 2 updates a batch-1 key and
    inserts a new one; maintenance (purge-compaction + vacuum) runs on
    its cadence and materializes the DVs."""
    import os

    import pandas as pd

    from cuplyr_spark.sources.connectors import (
        append_snapshot,
        read_append_snapshot,
    )
    from cuplyr_spark.streaming.stream import stream_upsert_append

    src = str(tmp_path / "src")
    os.makedirs(src)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    # the table must exist (first publish fixes schema); seed it
    import cuplyr_spark as cs

    seed = cs.from_pandas(
        spark, pd.DataFrame({"k": [1], "v": ["seed"]})
    )
    append_snapshot(seed, table, batch_id=0)

    pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}).to_parquet(
        f"{src}/b0.parquet", index=False
    )
    q = stream_upsert_append(
        spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src),
        table, key="k", checkpoint=ckpt,
    )
    q.awaitTermination()
    got = read_append_snapshot(spark, table).collect().sort_values("k")
    assert got["v"].tolist() == ["a", "b"]  # seed's k=1 replaced

    pd.DataFrame({"k": [2, 3], "v": ["B", "c"]}).to_parquet(
        f"{src}/b1.parquet", index=False
    )
    q = stream_upsert_append(
        spark.readStream.schema("k long, v string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src),
        table, key="k", checkpoint=ckpt,
        compact_every=1, vacuum_keep=1,
    )
    q.awaitTermination()
    got = read_append_snapshot(spark, table).collect().sort_values("k")
    assert got["v"].tolist() == ["a", "B", "c"]
    # purge-compaction on the cadence: no deletion vectors left behind
    from cuplyr_spark.sources.connectors import _read_log, _TableFS

    log = _read_log(_TableFS(table))
    assert not log.get("deletes")


def test_stream_append_snapshot_refreshes_views(spark, tmp_path):
    """The streaming-dashboard loop: the append sink advances an
    incremental view after every committed microbatch, so the view
    tracks the table exactly (insert-only arithmetic merges, cost ∝
    batch) and a checkpoint replay advances nothing twice."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from cuplyr_spark.sources.connectors import read_append_snapshot
    from cuplyr_spark.sources.views import (
        append_view_status,
        create_append_view,
        read_append_view,
    )
    from cuplyr_spark.streaming.stream import stream_append_snapshot

    src = str(tmp_path / "src")
    os.makedirs(src)
    table, view = str(tmp_path / "tbl"), str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]}).to_parquet(
        f"{src}/b0.parquet", index=False
    )

    def run():
        q = stream_append_snapshot(
            spark.readStream.schema("k long, v double").option(
                "maxFilesPerTrigger", 1
            ).parquet(src),
            table, checkpoint=ckpt, refresh_views=[view],
        )
        q.awaitTermination()

    # bootstrap: table must exist before its view — first run creates
    # it (the view dir doesn't exist yet, so pass no refresh_views)
    q = stream_append_snapshot(
        spark.readStream.schema("k long, v double").parquet(src),
        table, checkpoint=ckpt,
    )
    q.awaitTermination()
    create_append_view(spark, table, view, "k", {"sv": ("sum", "v"),
                                                 "n": ("count", None)})
    pd.DataFrame({"k": [1, 3], "v": [5.0, 30.0]}).to_parquet(
        f"{src}/b1.parquet", index=False
    )
    pd.DataFrame({"k": [3], "v": [1.0]}).to_parquet(
        f"{src}/b2.parquet", index=False
    )
    run()  # two microbatches, each refreshing the view
    assert append_view_status(spark, view)["lag_versions"] == 0
    got = {tuple(r) for r in read_append_view(spark, view).df.collect()}
    want = {
        tuple(r)
        for r in read_append_snapshot(spark, table).df.groupBy("k")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    run()  # replay with no new input: nothing moves
    assert {tuple(r) for r in read_append_view(spark, view).df.collect()} \
        == got
