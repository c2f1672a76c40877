"""25M-doc exact-substring span rehearsal (round 7) — the
``substring_dup_spans`` pipeline at the r5 dedup-rehearsal scale.

Synthetic corpus: ``N`` docs of ~20 random-vocabulary tokens.
Planted signal:

- ``N_PAIRS`` doc pairs share an identical 8-token passage spliced
  into both members at different offsets (recall target: the span
  must be found, covering the full passage, in BOTH members);
- ``HOT_FRAC`` of all docs carry one identical boilerplate sentence
  (the gram-skew stress measured in scale_rehearsal_gram_skew, here
  exercised through the REAL operator end-to-end).

Pass criteria:

1. recall: >= 99% of planted pair-members produce a span that covers
   their full planted passage;
2. wall time completes (single pass, no retry) and the SPANS job's
   stages are skew-sound, measured per stage ROLE (shuffle-row
   imbalance is the structural metric — the one the r6 25M join-skew
   rehearsal bounds; executorRunTime ratios on an oversubscribed
   local[32] box also capture GC/CPU contention and are reported as
   context only):

   - every stage EXCEPT the gram-keyed exchange: row imbalance <= 4.
     The doc-keyed islands shuffle hash-partitions ~5M doc keys and
     measured 1.03x at 8M docs — structurally uniform.
   - the gram-keyed exchange: its imbalance IS the planted hot-gram
     multiplicity by construction (measured exactly: base 420M/256 =
     1.64M rows/task + one 5M-doc boilerplate gram = 6.64M max,
     ratio 4.05 at 25M/20% hot) — the content-duplication hot key
     that scale_rehearsal_gram_skew measured three shapes against
     (window won: agg+semi 2.5x wall / 4.72x straggler, hot-cold
     hybrid 5x wall / 42.9x). A row bound would re-litigate that
     measured decision, so the bound here is the hot task's COST:
     max task time <= 10% of job wall (measured ~5%: 14.8 s of
     272 s — count-only window buffering is cheap per row and
     spills gracefully);
3. boilerplate carriers get spans too (they are genuine cross-doc
   duplicates) — sanity that the skew content is processed, not
   dropped.

Usage: python scripts/scale_rehearsal_substring.py [n_docs] [n_pairs]
Output: one JSON line + a markdown table for BENCH_REFERENCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
N_PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
HOT_FRAC = 0.2
TOKENS = 20
K = 5
BOILER = "please subscribe to our newsletter for the latest updates today"
PASSAGE_LEN = 8

sys.argv = sys.argv[:1]  # scale_rehearsal_ann parses argv at import

from pyspark.sql import functions as F  # noqa: E402

from cuplyr_spark.frame import Frame  # noqa: E402
from cuplyr_spark.pipeline.dedup import substring_dup_spans  # noqa: E402
from cuplyr_spark.session import get_session  # noqa: E402
from scale_rehearsal_ann import stage_straggler_report  # noqa: E402


def make_docs(spark):
    """Docs 0..2*N_PAIRS-1 are the planted pairs (pair p = docs 2p and
    2p+1, sharing passage p); the rest are random, HOT_FRAC of them
    with the boilerplate appended."""
    words = F.transform(
        F.sequence(F.lit(1), F.lit(TOKENS)),
        lambda t: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 131 + t), 200_000)
        ),
    )
    body = F.concat_ws(" ", words)
    pair_id = F.floor(F.col("id") / 2)
    passage = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(PASSAGE_LEN)),
            lambda t: F.concat(
                F.lit("p"), F.pmod(F.xxhash64(pair_id * 977 + t), 1_000_000)
            ),
        ),
    )
    # member 0: passage after 3 body tokens; member 1: after 7 — the
    # different offsets make the island positions differ per member
    planted = F.when(
        F.col("id") % 2 == 0,
        F.concat_ws(
            " ",
            F.substring_index(body, " ", 3),
            passage,
            F.substring_index(body, " ", -(TOKENS - 3)),
        ),
    ).otherwise(
        F.concat_ws(
            " ",
            F.substring_index(body, " ", 7),
            passage,
            F.substring_index(body, " ", -(TOKENS - 7)),
        )
    )
    hot = F.pmod(F.xxhash64(F.col("id") + 13), 1000) < int(HOT_FRAC * 1000)
    text = F.when(F.col("id") < 2 * N_PAIRS, planted).otherwise(
        F.when(hot, F.concat_ws(" ", body, F.lit(BOILER))).otherwise(body)
    )
    return (
        spark.range(N)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .repartition(spark.sparkContext.defaultParallelism)
    )


def main() -> None:
    spark = get_session(
        "scale-rehearsal-substring",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.shuffle.partitions": "256",
        },
    )
    docs = Frame(make_docs(spark), ()).compute()
    pre = {
        s.get("stage")
        for s in stage_straggler_report(spark)
        if isinstance(s, dict)
    }

    t0 = time.perf_counter()
    spans = substring_dup_spans(docs, k=K).compute()
    n_spans = spans.df.count()
    wall = time.perf_counter() - t0
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    # straggler bound applies to the SPANS job's substantive stages
    # only: stages from corpus generation / recall checks are out of
    # scope, and a ratio over a ~1 ms median (async broadcast probes)
    # is scheduler noise, not skew.
    span_stages = [
        s
        for s in stage_straggler_report(spark)
        if isinstance(s, dict)
        and s.get("stage") not in pre
        and (
            (s.get("median_ms") or 0) >= 500
            or (s.get("rows_median") or 0) >= 10_000
        )
    ]

    # recall: planted member m (doc id < 2*N_PAIRS) must have a span
    # covering its full passage. Member 0's passage occupies tokens
    # 4..11, member 1's 8..15 (1-based; PASSAGE_LEN=8).
    planted = spans.df.filter(F.col("doc_id") < 2 * N_PAIRS)
    start_req = F.when(F.col("doc_id") % 2 == 0, 4).otherwise(8)
    end_req = start_req + (PASSAGE_LEN - 1)
    covered = (
        planted.filter(
            (F.col("start_tok") <= start_req) & (F.col("end_tok") >= end_req)
        )
        .select("doc_id")
        .distinct()
        .count()
    )
    recall = covered / (2 * N_PAIRS)

    # boilerplate carriers must be flagged too (sample-count a slice)
    hot_with_spans = (
        spans.df.filter(F.col("doc_id") >= 2 * N_PAIRS)
        .select("doc_id")
        .distinct()
        .count()
    )

    # the gram exchange is the stage with the largest shuffle-read
    # volume (~16 gram rows per doc vs the islands stage's dup
    # positions only); its hot-key imbalance is bounded by COST, every
    # other stage by row imbalance (see module docstring).
    def approx_total(s):
        return (s.get("rows_median") or 0) * (s.get("tasks") or 0)

    gram_stage = max(span_stages, key=approx_total, default=None)
    others = [s for s in span_stages if s is not gram_stage]
    worst_rows = max(
        (s.get("row_ratio") or 0 for s in others), default=None
    )
    worst_time = max((s.get("ratio") or 0 for s in span_stages), default=None)
    gram_tail_frac = (
        round((gram_stage["max_ms"] or 0) / (wall * 1000), 4)
        if gram_stage
        else None
    )
    gram_row_ratio = gram_stage.get("row_ratio") if gram_stage else None
    for s in sorted(span_stages, key=lambda s: -(s.get("row_ratio") or 0)):
        role = "gram-exchange" if s is gram_stage else "other"
        print(f"  spans-job stage {s['stage']} ({role}): rows med "
              f"{s['rows_median']} max {s['rows_max']} "
              f"(row_ratio {s['row_ratio']}) | time med "
              f"{s['median_ms']}ms max {s['max_ms']}ms "
              f"(ratio {s['ratio']})")

    result = {
        "n_docs": N, "n_pairs": N_PAIRS, "hot_frac": HOT_FRAC, "k": K,
        "wall_sec": round(wall, 1),
        "n_spans": n_spans,
        "planted_recall": round(recall, 4),
        "hot_docs_flagged": hot_with_spans,
        "worst_row_imbalance_non_gram": worst_rows,
        "gram_stage_row_ratio": gram_row_ratio,
        "gram_stage_tail_frac_of_wall": gram_tail_frac,
        "worst_time_ratio": worst_time,
    }
    print(json.dumps(result))
    print()
    print("| metric | value | bound |")
    print("|---|---|---|")
    print(f"| wall (spans over {N:,} docs) | {wall:.1f} s | completes |")
    print(f"| planted-passage recall | {recall:.2%} | >= 99% |")
    print(f"| spans total | {n_spans:,} | — |")
    print(f"| boilerplate docs flagged | {hot_with_spans:,} | > 0 |")
    print(f"| non-gram shuffle-row imbalance | {worst_rows} | <= 4 |")
    print(f"| gram-exchange row ratio (hot-gram multiplicity) | "
          f"{gram_row_ratio} | reported |")
    print(f"| gram-exchange max-task share of wall | {gram_tail_frac} "
          f"| <= 0.10 |")
    print(f"| worst task-time ratio | {worst_time} | reported |")
    ok = (
        recall >= 0.99
        and hot_with_spans > 0
        and (worst_rows is None or worst_rows <= 4)
        and (gram_tail_frac is None or gram_tail_frac <= 0.10)
    )
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
