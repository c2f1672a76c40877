"""IVF index APPEND rehearsal (round 7) — incremental maintenance cost
must be proportional to the DELTA, not the corpus.

Stages a cell-partitioned IVF index over ``N`` vectors once (the r6
deployment shape), then appends a ``DELTA``-row batch with the
physical append path ``ivf_index_append`` models:
``assign cells map-side -> write.mode("append").partitionBy("cell")``.
No existing index row is read or rewritten — the append reads and
writes only the delta.

Pass criteria ("proportional to the delta, not the corpus"):

1. CORPUS-INDEPENDENCE — the direct test of the claim: appending the
   same delta onto an index 4x smaller must cost about the same wall
   time (within 2x — as the delta shrinks, a fixed floor of job
   launch + ~n_cells file commits dominates both, and that floor is
   corpus-independent too);
2. append is far cheaper than rebuild: ``t_append < 0.35 * t_build``;
3. the appended index is complete and correct: a probe-pruned search
   over the appended parquet returns EXACTLY the same top-1 set as the
   same search over a from-scratch full index (both under the same
   staged centroids).

Measured floors this script exposed while being written (kept here as
the record): an un-repartitioned dynamic-partition append opens
T x n_cells files and cost 58% of the full build for a 5% delta
(fixed by ``ivf_index_append_parquet``'s repartition-on-cell); slicing
the delta from spark.range's contiguous cache partitions serialized
the map-side assignment onto 2 cores (7x — rehearsal artifact, fixed
by spreading the delta as a real ingest batch would arrive).

Usage: python scripts/scale_rehearsal_ivf_append.py [n_rows] [delta]
Output: one JSON line + a markdown table for BENCH_REFERENCE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cuplyr_spark import Frame
from cuplyr_spark.pipeline import similarity as S
from cuplyr_spark.session import get_session

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DELTA = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
N_CELLS = 64
N_PROBE = 8
N_QUERIES = 25
SCRATCH = os.environ.get("REHEARSAL_SCRATCH", "/tmp/rehearsal_ivf_append")


def main() -> None:
    import scale_rehearsal_ann as ann

    # scale_rehearsal_ann reads ITS dims from sys.argv[2] at import —
    # this script's argv[2] is the delta row count, so pin dims here.
    ann.DIMS = 32

    spark = get_session(
        "scale-rehearsal-ivf-append", extra_conf={"spark.ui.enabled": "false"}
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    total = ann.make_vectors(spark, N + DELTA).compute()
    base = total.filter(f"vec_id < {N}")
    # spark.range caches CONTIGUOUS id ranges per partition, so slicing
    # the delta by id would land all its rows on ~2 of 32 cache
    # partitions and serialize the map-side assignment onto 2 cores (a
    # measured 7x inflation of the append). A real ingest batch arrives
    # as its own files with its own parallelism — model that by
    # spreading + materializing the delta BEFORE the timed append.
    delta = (
        total.filter(f"vec_id >= {N}")
        .repartition(spark.sparkContext.defaultParallelism)
        .compute()
    )

    cents = S.ivf_centroids(base, n_cells=N_CELLS, refine_iters=1)
    cents.df.write.mode("overwrite").parquet(f"{SCRATCH}/centroids")
    staged_cents = Frame(spark.read.parquet(f"{SCRATCH}/centroids"), ())

    # one-time index build over the base corpus
    t0 = time.perf_counter()
    S.ivf_index(base, centroids=staged_cents).df.write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{SCRATCH}/index")
    t_build = time.perf_counter() - t0

    # the append: assign cells to the delta only, append its partitions
    t0 = time.perf_counter()
    S.ivf_index_append_parquet(f"{SCRATCH}/index", delta, staged_cents)
    t_append = time.perf_counter() - t0

    # corpus-independence control: same delta onto a 4x smaller index
    small = total.filter(f"vec_id < {N // 4}")
    S.ivf_index(small, centroids=staged_cents).df.write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{SCRATCH}/index_small")
    t0 = time.perf_counter()
    S.ivf_index_append_parquet(f"{SCRATCH}/index_small", delta, staged_cents)
    t_append_small = time.perf_counter() - t0

    # correctness: appended index == full rebuild, via identical search
    S.ivf_index(total, centroids=staged_cents).df.write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{SCRATCH}/index_full")

    def search(path: str):
        idx = Frame(spark.read.parquet(path), ())
        got = S.ivf_cosine_topk(
            total, k=1, n_probe=N_PROBE,
            query_filter=f"vec_id < {N_QUERIES}",
            centroids=staged_cents, index=idx,
        ).collect()
        return sorted(map(tuple, got[["query_id", "neighbor_id"]].values))

    appended, rebuilt = search(f"{SCRATCH}/index"), search(f"{SCRATCH}/index_full")
    n_index_rows = spark.read.parquet(f"{SCRATCH}/index").count()

    frac = DELTA / N
    corpus_independent = t_append <= 2.0 * t_append_small
    sub_rebuild = t_append < 0.35 * t_build
    result = {
        "n_rows": N, "delta": DELTA, "n_cells": N_CELLS,
        "build_sec": round(t_build, 1),
        "append_sec": round(t_append, 1),
        "append_small_corpus_sec": round(t_append_small, 1),
        "delta_fraction": round(frac, 4),
        "append_over_build": round(t_append / t_build, 4),
        "index_rows_after_append": n_index_rows,
        "search_matches_rebuild": appended == rebuilt,
        "corpus_independent": corpus_independent,
        "sub_rebuild": sub_rebuild,
    }
    print(json.dumps(result))
    print()
    print("| variant | wall s | result |")
    print("|---|---|---|")
    print(f"| index build, {N:,} vectors -> cell-partitioned parquet | {t_build:.1f} | one-time |")
    print(f"| APPEND {DELTA:,} vectors ({frac:.1%} of corpus) | {t_append:.1f} | {t_append / t_build:.1%} of build |")
    print(f"| same append onto 4x-smaller index | {t_append_small:.1f} | corpus-independence bound: 2x |")
    print(f"| appended-index search == full-rebuild search | — | {appended == rebuilt} |")
    print(f"| rows after append | {n_index_rows:,} | expect {N + DELTA:,} |")
    ok = (
        corpus_independent
        and sub_rebuild
        and appended == rebuilt
        and n_index_rows == N + DELTA
    )
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
