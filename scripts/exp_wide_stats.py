"""Measure the segment-stats cost on wide schemas (r16 opt round).

Protocol (matches the r15 measurement): the wide input is materialized
to parquet ONCE; every variant then reads it and drives a noop-sink
write (guide 1.4) so the timing isolates the stats aggregates from
input generation and disk variance.

  A  noop write, no stats (floor)
  B  noop write + observe(min, max, nullsum, HLL)     -- current path
  C  noop write + observe(min, max, nullsum)          -- no HLL
  D  noop write + observe(min, max, count(col))       -- count vs nullsum
  E  noop write, then READ-BACK agg(min,max,null,HLL) -- 2nd pass
  F  noop write, read-back agg(min,max,null) + SAMPLED-HLL job (5% coin)
  G  noop write + observe(min,max,nullsum, hashset)   -- collect_set(pmod(xxhash64,1024))
  H  noop write, read-back agg(min,max,null, hashset)
  I  noop write, read-back agg(min,max,null) + sampled hashset job

Usage: python scripts/exp_wide_stats.py [n_rows] [n_cols] [variants] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuplyr_spark.session import get_session  # noqa: E402

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_COLS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
ONLY = set(sys.argv[3]) if len(sys.argv) > 3 else None
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3

spark = get_session(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
from pyspark.sql import Observation, functions as F  # noqa: E402

SRC = f"/tmp/exp_wide_stats_src_{N_ROWS}_{N_COLS}"


def mkdf():
    # mixed types like a real wide table: 40% double, 30% long, 30% string
    df = spark.range(N_ROWS)
    cols = [F.col("id")]
    for i in range(N_COLS):
        if i % 10 < 4:
            cols.append((F.col("id") * 1.7 + i).alias(f"d{i}"))
        elif i % 10 < 7:
            cols.append((F.col("id") * 3 + i).alias(f"l{i}"))
        else:
            # low-cardinality strings on every ~17th col (dictionary
            # candidates), high-card otherwise
            if i % 50 == 7:
                cols.append(
                    F.concat(F.lit("cat"), (F.col("id") % 7).cast("string")).alias(f"s{i}")
                )
            else:
                cols.append(
                    F.concat(F.lit("val"), (F.col("id") * 13 + i).cast("string")).alias(f"s{i}")
                )
    return df.select(cols)


if not os.path.exists(SRC):
    mkdf().write.mode("overwrite").parquet(SRC)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def stat_cols(df):
    return [c for c in df.columns if c != "id"]


def agg_stats(df, with_hll=False, count_form=False, hashset=False, minmax=True):
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(stat_cols(df)):
        col = F.col(c)
        if minmax:
            aggs += [F.min(col).alias(f"mn{i}"), F.max(col).alias(f"mx{i}")]
            if count_form:
                aggs.append(F.count(col).alias(f"nn{i}"))
            else:
                aggs.append(F.sum(F.isnull(col).cast("long")).alias(f"nu{i}"))
        if with_hll:
            aggs.append(F.approx_count_distinct(col).alias(f"ad{i}"))
        if hashset:
            aggs.append(
                F.collect_set(
                    F.when(col.isNotNull(), F.pmod(F.xxhash64(col), F.lit(1024)))
                ).alias(f"hs{i}")
            )
    return aggs


def run(tag, fn, reps=REPS):
    ts = []
    for r in range(reps):
        df = spark.read.parquet(SRC)
        t0 = time.time()
        fn(df)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{tag}: median {ts[len(ts)//2]:.2f}s  all={[f'{t:.2f}' for t in ts]}", flush=True)


def write_obs(df, **kw):
    obs = Observation()
    noop(df.observe(obs, *agg_stats(df, **kw)))
    return obs.get


def readback(df, **kw):
    noop(df)
    sdf = spark.read.parquet(SRC)
    return sdf.agg(*agg_stats(sdf, **kw)).first()


def readback_sampled(df, frac=0.05, hashset=False):
    noop(df)
    sdf = spark.read.parquet(SRC)
    sdf.agg(*agg_stats(sdf)).first()
    coin = sdf.withColumn("__coin", F.rand(42))
    sc = stat_cols(sdf)
    if hashset:
        aggs = [
            F.collect_set(
                F.when(
                    (F.col("__coin") < frac) & F.col(c).isNotNull(),
                    F.pmod(F.xxhash64(F.col(c)), F.lit(1024)),
                )
            ).alias(f"hs{i}")
            for i, c in enumerate(sc)
        ]
    else:
        aggs = [
            F.approx_count_distinct(
                F.when(F.col("__coin") < frac, F.col(c))
            ).alias(f"ad{i}")
            for i, c in enumerate(sc)
        ]
    coin.agg(*aggs).first()


def arrow_stats(df, cap=33):
    """Variant J: vectorized per-batch stats via mapInArrow (guide 4.2).

    Emits one partial-stats row per column per TASK (pickled payloads),
    merged driver-side: min/max, null count, rows, and the capped exact
    distinct set (overflow-marked past ``cap``) in ONE pass -- no HLL,
    no second dictionary job, memory bounded at cap values per column.
    """
    import pickle

    noop(df)  # the segment write this read-back would follow
    sdf = spark.read.parquet(SRC)
    names = stat_cols(sdf)

    def stats_fn(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        state = {}  # name -> [min, max, nulls, rows, set|None]
        for batch in it:
            tbl = pa.Table.from_batches([batch])
            for name in names:
                arr = tbl.column(name)
                st = state.setdefault(name, [None, None, 0, 0, set()])
                st[2] += arr.null_count
                st[3] += len(arr)
                if len(arr) - arr.null_count > 0:
                    mm = pc.min_max(arr)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                    st[0] = mn if st[0] is None else min(st[0], mn)
                    st[1] = mx if st[1] is None else max(st[1], mx)
                if st[4] is not None:
                    u = pc.unique(arr.combine_chunks().drop_null())
                    if len(u) > cap:
                        st[4] = None
                    else:
                        st[4] |= set(u.to_pylist())
                        if len(st[4]) > cap:
                            st[4] = None
        out_names, blobs = [], []
        for name, st in state.items():
            out_names.append(name)
            blobs.append(pickle.dumps(st if st[4] is None else
                                      (st[0], st[1], st[2], st[3], sorted(map(str, st[4])))))
        yield pa.RecordBatch.from_arrays(
            [pa.array(out_names, pa.string()), pa.array(blobs, pa.binary())],
            names=["col", "blob"],
        )

    rows = sdf.mapInArrow(stats_fn, "col string, blob binary").collect()
    # driver-side merge
    import pickle

    merged = {}
    for r in rows:
        st = pickle.loads(r["blob"])
        m = merged.setdefault(r["col"], [None, None, 0, 0, set()])
        m[2] += st[2]
        m[3] += st[3]
        if st[0] is not None:
            m[0] = st[0] if m[0] is None else min(m[0], st[0])
            m[1] = st[1] if m[1] is None else max(m[1], st[1])
        if m[4] is not None and st[4] is not None:
            m[4] |= set(st[4])
            if len(m[4]) > cap:
                m[4] = None
        elif st[4] is None:
            m[4] = None
    return merged


def pyarrow_direct_stats(df, cap=33):
    """Variant K: executors read the written parquet files DIRECTLY with
    pyarrow (native columnar read, no JVM row conversion) and compute
    min/max/null/capped-distinct vectorized; one partial per file,
    merged driver-side."""
    import glob
    import pickle

    noop(df)  # the segment write this read-back would follow
    files = sorted(glob.glob(os.path.join(SRC, "*.parquet")))
    names = stat_cols(spark.read.parquet(SRC))
    sc = spark.sparkContext

    def per_file(paths):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for path in paths:
            tbl = pq.read_table(path, columns=names)
            out = {}
            for name in names:
                arr = tbl.column(name)
                nulls = arr.null_count
                rows = len(arr)
                mn = mx = None
                vals: set | None = set()
                if rows - nulls > 0:
                    mm = pc.min_max(arr)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                u = pc.unique(arr.combine_chunks().drop_null())
                if len(u) > cap:
                    vals = None
                else:
                    vals = set(u.to_pylist())
                out[name] = (mn, mx, nulls, rows, vals)
            yield pickle.dumps(out)

    partials = sc.parallelize(files, len(files)).mapPartitions(per_file).collect()
    merged = {}
    for blob in partials:
        for name, st in pickle.loads(blob).items():
            m = merged.setdefault(name, [None, None, 0, 0, set()])
            m[2] += st[2]
            m[3] += st[3]
            if st[0] is not None:
                m[0] = st[0] if m[0] is None else min(m[0], st[0])
                m[1] = st[1] if m[1] is None else max(m[1], st[1])
            if m[4] is not None and st[4] is not None:
                m[4] |= st[4]
                if len(m[4]) > cap:
                    m[4] = None
            else:
                m[4] = None
    return merged


VARIANTS = {
    "K": ("pyarrow direct-read stats (capped sets)", pyarrow_direct_stats),
    "J": ("arrow mapInArrow stats (capped sets)", arrow_stats),
    "A": ("noop floor", noop),
    "B": ("obs mmn + HLL (current)", lambda df: write_obs(df, with_hll=True)),
    "C": ("obs mmn", lambda df: write_obs(df)),
    "D": ("obs mm + count", lambda df: write_obs(df, count_form=True)),
    "E": ("readback mmn + HLL", lambda df: readback(df, with_hll=True)),
    "F": ("readback mmn + sampled HLL 5%", lambda df: readback_sampled(df)),
    "G": ("obs mmn + hashset(1024)", lambda df: write_obs(df, hashset=True)),
    "H": ("readback mmn + hashset(1024)", lambda df: readback(df, hashset=True)),
    "I": ("readback mmn + sampled hashset 5%", lambda df: readback_sampled(df, hashset=True)),
}

print(f"rows={N_ROWS} cols={N_COLS} cpus={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
for k, (tag, fn) in VARIANTS.items():
    if ONLY and k not in ONLY:
        continue
    run(f"{k} {tag}", fn)
