"""Hot-gram guard rehearsal (round 8; VERDICT r7 #2) — the OPT-IN
``max_gram_freq`` cap in ``substring_dup_spans``, measured end-to-end
through the REAL operator against the measured-default window shape.

Context: the r7 gram-skew rehearsal measured the window shape 2-5x
cheaper in wall than every count-before-window alternative, so the
default stays the window (see scale_rehearsal_gram_skew.py — the cap
is opt-in, not a silent plan change). This rehearsal answers the two
questions the guard exists for:

1. SEMANTICS: on a corpus whose boilerplate is genuinely cross-doc
   (the only kind a sane cap can catch), guarded and default results
   are IDENTICAL — the clamp rule changes nothing real;
2. BOUND: with the guard on, the gram-keyed stages' worst straggler
   ratio is CONSTANT (bounded by the cap — the hot gram's rows never
   enter a window partition), where the default's gram-exchange ratio
   equals the planted hot-gram multiplicity by construction;
3. COST, stated honestly: the guard's frequency count is its own pass
   over the exploded grams — the wall overhead is reported and is WHY
   the default is off.

Usage: python scripts/scale_rehearsal_gram_guard.py [n_docs] [hot_frac]
Output: one JSON line + a markdown table for BENCH_REFERENCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from cuplyr_spark.frame import Frame
from cuplyr_spark.pipeline.dedup import substring_dup_spans
from cuplyr_spark.session import get_session

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
HOT_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
sys.argv = sys.argv[:1]
from scale_rehearsal_ann import stage_straggler_report  # noqa: E402

TOKENS = 20
K = 5
CAP = 100_000
BOILER = "please subscribe to our newsletter for the latest updates today"


def make_docs(spark, n: int):
    words = F.transform(
        F.sequence(F.lit(1), F.lit(TOKENS)),
        lambda t: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 131 + t), 50000)
        ),
    )
    body = F.concat_ws(" ", words)
    hot = F.pmod(F.xxhash64(F.col("id") + 7), 1000) < int(HOT_FRAC * 1000)
    text = F.when(hot, F.concat_ws(" ", body, F.lit(BOILER))).otherwise(body)
    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .repartition(spark.sparkContext.defaultParallelism)
    )


def main() -> None:
    spark = get_session(
        "scale-rehearsal-gram-guard",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.shuffle.partitions": "200",
        },
    )
    docs = Frame(make_docs(spark, N).persist(), ())
    docs.df.count()

    results = {}
    seen: set = set()
    for name, cap in (("default_window", None), ("guarded", CAP)):
        t0 = time.perf_counter()
        spans = substring_dup_spans(docs, k=K, max_gram_freq=cap)
        agg = spans.df.agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("n_grams").alias("total_grams"),
            F.sum(F.col("end_tok") - F.col("start_tok") + 1).alias(
                "total_span_tokens"
            ),
        ).collect()[0]
        wall = time.perf_counter() - t0
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        stragglers = [
            s for s in stage_straggler_report(spark) if isinstance(s, dict)
        ]
        new = [s for s in stragglers if s.get("stage") not in seen]
        seen |= {s.get("stage") for s in stragglers}
        worst = max((s.get("ratio") or 0 for s in new), default=None)
        results[name] = {
            "wall_sec": round(wall, 1),
            "n_spans": agg["n_spans"],
            "total_grams": int(agg["total_grams"] or 0),
            "total_span_tokens": int(agg["total_span_tokens"] or 0),
            "worst_straggler_ratio": worst,
        }

    d, g = results["default_window"], results["guarded"]
    identical = all(
        d[k] == g[k] for k in ("n_spans", "total_grams", "total_span_tokens")
    )
    # the default's gram exchange carries the hot multiplicity; the
    # guard must flatten the worst ratio to a scale-independent bound
    bound_ok = (g["worst_straggler_ratio"] or 99) <= 4
    ok = identical and bound_ok
    out = {
        "n_docs": N,
        "hot_frac": HOT_FRAC,
        "k": K,
        "cap": CAP,
        "results_identical": identical,
        **{f"{n}_{k2}": v for n, r in results.items() for k2, v in r.items()},
        "pass": ok,
    }
    print(json.dumps(out))
    print()
    print("| shape | wall s | spans | worst straggler max/median |")
    print("|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['wall_sec']} | {r['n_spans']:,} | "
            f"{r['worst_straggler_ratio']} |"
        )
    print(
        f"REHEARSAL {'PASS' if ok else 'FAIL'} — identical={identical}, "
        f"guarded straggler {g['worst_straggler_ratio']} (bound 4, constant "
        f"in corpus size); guard overhead "
        f"{round(g['wall_sec'] / max(d['wall_sec'], 0.1), 2)}x wall — the "
        "measured reason the cap is opt-in."
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
