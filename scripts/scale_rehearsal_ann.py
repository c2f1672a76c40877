"""5M-vector scale rehearsal for the similarity path (round 5).

The ANN twin of scale_rehearsal_dedup.py: validates that the
similarity operators hold up at a vector count where brute force is
still checkable but lazy plans start to matter, with DETERMINISTIC
synthetic data (hash arithmetic, no RNG) so every run is identical.

Corpus: 5M 32-dim vectors with components derived from xxhash64 of
(id, dim) — effectively random directions. Queries: the 10 vectors
with ids 0..9, each PERTURBED by a small deterministic offset, so
each query's true nearest neighbor is its source vector (planted
ground truth without a brute-force pass; verified against exact
brute force anyway).

Checks:
  - exact brute-force cosine top-1 finds the planted source for all
    queries (sanity of the search itself);
  - quantized (int8) top-1 agrees with exact top-1 (quantization
    preserves ranking at realistic separation);
  - wall time for each variant (exact broadcast scan vs quantized);
  - straggler bound: max/median task time <= 10x per stage.

Usage: python scripts/scale_rehearsal_ann.py [n_rows] [dims]
Output: one JSON line + a markdown table for BENCH_REFERENCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cuplyr_spark import Frame
from cuplyr_spark.pipeline import similarity as S
from cuplyr_spark.session import get_session

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
DIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_QUERIES = 10


def make_vectors(spark, n: int) -> Frame:
    """Deterministic pseudo-random vectors: component d of vector i is
    (xxhash64(i*31 + d) % 2001 - 1000) / 1000 in [-1, 1]."""
    comp = [
        (
            (F.pmod(F.xxhash64(F.col("id") * 31 + F.lit(d)), 2001) - 1000)
            / 1000.0
        ).cast("float")
        for d in range(DIMS)
    ]
    return Frame(
        spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*comp).alias("embedding")
        ),
        (),
    )


def make_queries(spark) -> Frame:
    """Queries = vectors 0..9 with a +0.01 deterministic nudge on each
    component: cosine(query, source) ~ 1, far above any other match in
    a random 32-dim corpus, so the planted top-1 is unambiguous."""
    comp = [
        (
            (F.pmod(F.xxhash64(F.col("id") * 31 + F.lit(d)), 2001) - 1000)
            / 1000.0
            + 0.01
        ).cast("float")
        for d in range(DIMS)
    ]
    return Frame(
        spark.range(N_QUERIES).select(
            F.col("id").alias("vec_id"), F.array(*comp).alias("embedding")
        ),
        (),
    )


def stage_straggler_report(spark) -> list[dict]:
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    try:
        with urllib.request.urlopen(f"{base}/stages?status=complete", timeout=10) as r:
            stages = json.load(r)
    except Exception as e:  # pragma: no cover
        return [{"error": str(e)}]
    out = []
    for st in stages:
        if st.get("numCompleteTasks", 0) < 8:
            continue
        try:
            url = f"{base}/stages/{st['stageId']}/{st['attemptId']}/taskSummary?quantiles=0.5,1.0"
            with urllib.request.urlopen(url, timeout=10) as r:
                q = json.load(r)
            med, mx = q["executorRunTime"]
            # row-level imbalance — the STRUCTURAL skew metric (what
            # survives a cluster scale-up); executorRunTime ratios on
            # an oversubscribed local[32] box also capture GC/CPU
            # contention that a real cluster would not see.
            rows_med = rows_max = None
            sr = q.get("shuffleReadMetrics") or {}
            if sr.get("readRecords") and sr["readRecords"][1] > 0:
                rows_med, rows_max = sr["readRecords"]
            else:
                im = q.get("inputMetrics") or {}
                if im.get("recordsRead") and im["recordsRead"][1] > 0:
                    rows_med, rows_max = im["recordsRead"]
            out.append(
                {"stage": st["stageId"], "tasks": st["numCompleteTasks"],
                 "name": (st.get("name") or "")[:60],
                 "median_ms": med, "max_ms": mx,
                 "ratio": round(mx / med, 2) if med > 0 else None,
                 "rows_median": rows_med, "rows_max": rows_max,
                 "row_ratio": (
                     round(rows_max / rows_med, 2)
                     if rows_med else None
                 )}
            )
        except Exception:
            continue
    return out


def main() -> None:
    spark = get_session(
        "scale-rehearsal-ann", extra_conf={"spark.ui.enabled": "true"}
    )
    corpus = make_vectors(spark, N)
    queries = make_queries(spark)

    t0 = time.perf_counter()
    exact = S.cosine_topk(corpus, k=1, queries=queries).collect()
    t_exact = time.perf_counter() - t0
    exact_top1 = dict(zip(exact["query_id"], exact["neighbor_id"]))

    t0 = time.perf_counter()
    quant = S.quantized_cosine_topk(corpus, k=1, queries=queries).collect()
    t_quant = time.perf_counter() - t0
    quant_top1 = dict(zip(quant["query_id"], quant["neighbor_id"]))

    planted_exact = sum(int(exact_top1.get(q) == q) for q in range(N_QUERIES))
    agree = sum(
        int(exact_top1.get(q) == quant_top1.get(q)) for q in range(N_QUERIES)
    )

    stragglers = stage_straggler_report(spark)
    worst = max(
        (s.get("ratio") or 0 for s in stragglers if isinstance(s, dict)),
        default=None,
    )

    result = {
        "n_rows": N,
        "dims": DIMS,
        "exact_top1_sec": round(t_exact, 1),
        "quantized_top1_sec": round(t_quant, 1),
        "planted_found_exact": planted_exact,
        "quantized_agrees_with_exact": agree,
        "n_queries": N_QUERIES,
        "worst_straggler_ratio": worst,
    }
    print(json.dumps(result))
    print()
    print("| variant | wall s | result |")
    print("|---|---|---|")
    print(f"| exact brute-force top-1 | {t_exact:.1f} | planted found "
          f"{planted_exact}/{N_QUERIES} |")
    print(f"| int8-quantized top-1 | {t_quant:.1f} | agrees with exact "
          f"{agree}/{N_QUERIES} |")
    print(f"| worst straggler max/median | {worst} | bound: 10x |")
    ok = (
        planted_exact == N_QUERIES
        and agree == N_QUERIES
        and (worst is None or worst <= 10)
    )
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
