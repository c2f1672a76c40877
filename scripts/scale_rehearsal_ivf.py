"""5M-vector IVF rehearsal (round 6) — the cell-probed ANN path at
scale, on the r6 literal-centroid plan shape.

The r5 ANN rehearsal covered exact brute force and int8 quantization;
IVF was only ever contract-tested at sf scale. This run stages
centroids once (the ``centroids=`` stage-once path: 64 cells, one
Lloyd refinement over all 5M vectors), writes them to parquet, then
searches 50 in-corpus queries with n_probe=8 and scores recall@1
against exact brute force over the same queries.

What the r6 rewrite changed (and this run exercises): cell assignment
and probe selection are literal-centroid map-side argmax — ZERO corpus
shuffle. The pre-r6 crossJoin+window assignment would have exchanged
5M x 64 vector-carrying rows (~96 GB) for the same answer.

Usage: python scripts/scale_rehearsal_ivf.py [n_rows] [dims]
Output: one JSON line + a markdown table for BENCH_REFERENCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cuplyr_spark import Frame
from cuplyr_spark.pipeline import similarity as S
from cuplyr_spark.session import get_session
from scale_rehearsal_ann import make_vectors, stage_straggler_report

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
DIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_QUERIES = 50
N_CELLS = 64
N_PROBE = 8
SCRATCH = os.environ.get("REHEARSAL_SCRATCH", "/tmp/rehearsal_ivf")


def main() -> None:
    import scale_rehearsal_ann as ann

    ann.DIMS = DIMS  # make_vectors reads the module global
    spark = get_session(
        "scale-rehearsal-ivf", extra_conf={"spark.ui.enabled": "true"}
    )
    corpus = make_vectors(spark, N)

    t0 = time.perf_counter()
    cents = S.ivf_centroids(corpus, n_cells=N_CELLS, refine_iters=1)
    cents.df.write.mode("overwrite").parquet(f"{SCRATCH}/centroids")
    t_stage = time.perf_counter() - t0

    staged = Frame(spark.read.parquet(f"{SCRATCH}/centroids"), ())
    t0 = time.perf_counter()
    approx = S.ivf_cosine_topk(
        corpus, k=1, n_probe=N_PROBE,
        query_filter=f"vec_id < {N_QUERIES}", centroids=staged,
    ).collect()
    t_ivf = time.perf_counter() - t0
    ivf_top1 = dict(zip(approx["query_id"], approx["neighbor_id"]))

    t0 = time.perf_counter()
    exact = S.cosine_topk(
        corpus, k=1, query_filter=f"vec_id < {N_QUERIES}"
    ).collect()
    t_exact = time.perf_counter() - t0
    exact_top1 = dict(zip(exact["query_id"], exact["neighbor_id"]))

    recall = sum(
        int(ivf_top1.get(q) == exact_top1.get(q)) for q in range(N_QUERIES)
    )
    stragglers = stage_straggler_report(spark)
    worst = max(
        (s.get("ratio") or 0 for s in stragglers if isinstance(s, dict)),
        default=None,
    )

    result = {
        "n_rows": N, "dims": DIMS, "n_cells": N_CELLS, "n_probe": N_PROBE,
        "n_queries": N_QUERIES,
        "stage_centroids_sec": round(t_stage, 1),
        "ivf_search_sec": round(t_ivf, 1),
        "exact_search_sec": round(t_exact, 1),
        "recall_at_1": recall,
        "worst_straggler_ratio": worst,
    }
    print(json.dumps(result))
    print()
    print("| variant | wall s | result |")
    print("|---|---|---|")
    print(f"| stage centroids (64 cells, 1 Lloyd pass over 5M) -> parquet | {t_stage:.1f} | one-time |")
    print(f"| IVF search, 50 queries, n_probe=8/64 | {t_ivf:.1f} | recall@1 {recall}/{N_QUERIES} vs exact |")
    print(f"| exact brute force, same 50 queries | {t_exact:.1f} | ground truth |")
    print(f"| worst straggler max/median | {worst} | bound: 10x |")
    ok = recall >= int(N_QUERIES * 0.9) and (worst is None or worst <= 10)
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
