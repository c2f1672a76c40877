"""IVF index APPEND rehearsal (round 7) — incremental maintenance cost
must be proportional to the DELTA, not the corpus.

Stages a cell-partitioned IVF index over ``N`` vectors once (the r6
deployment shape), then appends a ``DELTA``-row batch with the
physical append path ``ivf_index_append`` models:
``assign cells map-side -> write.mode("append").partitionBy("cell")``.
No existing index row is read or rewritten — the append reads and
writes only the delta.

Pass criteria:

1. append wall time scales with the delta: ``t_append <= t_build *
   (DELTA/N) * SLACK`` (SLACK covers fixed job-launch overhead, which
   dominates as the delta shrinks);
2. the appended index is complete and correct: a probe-pruned search
   over the appended parquet returns EXACTLY the same top-1 set as the
   same search over a from-scratch full index (both under the same
   staged centroids).

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

    spark = get_session(
        "scale-rehearsal-ivf-append", extra_conf={"spark.ui.enabled": "false"}
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    total = ann.make_vectors(spark, N + DELTA).compute()
    base = total.filter(f"vec_id < {N}")
    delta = total.filter(f"vec_id >= {N}")

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
    S.ivf_index(delta, centroids=staged_cents).df.write.mode(
        "append"
    ).partitionBy("cell").parquet(f"{SCRATCH}/index")
    t_append = time.perf_counter() - t0

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
    slack = 3.0  # fixed job-launch overhead dominates small deltas
    proportional = t_append <= max(t_build * frac * slack, 5.0)
    result = {
        "n_rows": N, "delta": DELTA, "n_cells": N_CELLS,
        "build_sec": round(t_build, 1),
        "append_sec": round(t_append, 1),
        "delta_fraction": round(frac, 4),
        "append_over_build": round(t_append / t_build, 4),
        "index_rows_after_append": n_index_rows,
        "search_matches_rebuild": appended == rebuilt,
        "proportional": proportional,
    }
    print(json.dumps(result))
    print()
    print("| variant | wall s | result |")
    print("|---|---|---|")
    print(f"| index build, {N:,} vectors -> cell-partitioned parquet | {t_build:.1f} | one-time |")
    print(f"| APPEND {DELTA:,} vectors ({frac:.1%} of corpus) | {t_append:.1f} | {t_append / t_build:.1%} of build |")
    print(f"| appended-index search == full-rebuild search | — | {appended == rebuilt} |")
    print(f"| rows after append | {n_index_rows:,} | expect {N + DELTA:,} |")
    ok = proportional and appended == rebuilt and n_index_rows == N + DELTA
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
