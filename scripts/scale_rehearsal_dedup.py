"""25M-row scale rehearsal for the dedup path (VERDICT r4 item 5).

Validates the 100 TB skew guards empirically rather than by argument:
runs minhash_lsh_pairs -> dedup_clusters and dedup_paragraphs
end-to-end at the BASELINE.md row scale (25M synthetic docs) with a
PLANTED degenerate bucket (100k identical documents) that must be
killed by the LSH bucket cap, plus planted genuine near-dup pairs that
must survive it.

Checks:
  - wall time per phase (noop-sink execution, nothing collected);
  - the skew guard actually dropped the degenerate bucket(s): the
    planted 100k-doc clique would otherwise contribute ~5e9 candidate
    pairs / one quadratic straggler task;
  - recall: the planted near-dup pairs ARE found;
  - straggler bound: for every completed stage, max task time <= 10x
    the stage's median task time (read from the Spark UI REST API --
    the UI is enabled for this script only).

Usage: python scripts/scale_rehearsal_dedup.py [n_rows]
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
from cuplyr_spark.pipeline import dedup as D
from cuplyr_spark.session import get_session

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
SKEW_CLIQUE = 100_000          # identical docs -> one degenerate LSH bucket
NEAR_DUP_EVERY = 1_000         # docs k*1000+501 and +502 share text
MAX_BUCKET = 10_000            # operator default cap

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "ember", "quartz",
    "willow", "harbor", "meadow", "cinder", "falcon", "granite",
    "juniper", "lantern", "marble", "nectar", "orchid", "prairie",
]


def make_corpus(spark, n: int) -> Frame:
    """Deterministic synthetic corpus, generated JVM-side (no data
    materialized on the driver). Word choice is hash arithmetic over
    the row id so every run is identical."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    nv = len(VOCAB)

    def word(salt: int) -> F.Column:
        # near-dup planting: docs k*1000+501 and k*1000+502 share the
        # SAME word stream (body derived from a shared anchor id);
        # 501/502 avoids the %100 footer rule so both docs are
        # byte-identical and the pair is found deterministically
        anchor = F.when(
            (F.col("id") % NEAR_DUP_EVERY).isin(501, 502),
            F.floor(F.col("id") / NEAR_DUP_EVERY).cast("long") * NEAR_DUP_EVERY
            + 501,
        ).otherwise(F.col("id"))
        return vocab[F.pmod(F.xxhash64(anchor * F.lit(salt + 17)), nv).cast("int")]

    body = F.concat_ws(" ", *[word(s) for s in range(12)])
    text = F.when(
        F.col("id") < SKEW_CLIQUE,
        # the planted degenerate clique: byte-identical boilerplate
        F.lit("terms of service apply contact support for details today"),
    ).otherwise(body)
    # paragraph structure for the paragraph scrub: every 100th doc
    # carries a shared footer paragraph that must dedup to 1 survivor.
    # Clique docs get the SAME second paragraph so the whole clique is
    # byte-identical -> every one of its band buckets is exactly
    # SKEW_CLIQUE wide and the cap provably kills all of them.
    para2 = F.when(
        (F.col("id") < SKEW_CLIQUE) | (F.col("id") % 100 == 0),
        F.lit("subscribe to our newsletter now"),
    ).otherwise(F.concat_ws(" ", *[word(s) for s in range(12, 16)]))
    return Frame(
        spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws("\n", text, para2).alias("text"),
        ),
        (),
    )


def run_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def stage_straggler_report(spark) -> list[dict]:
    """Per-stage max/median task duration from the UI REST API."""
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    try:
        with urllib.request.urlopen(f"{base}/stages?status=complete", timeout=10) as r:
            stages = json.load(r)
    except Exception as e:  # pragma: no cover - diagnostics only
        return [{"error": f"UI REST unavailable: {e}"}]
    out = []
    for st in stages:
        sid, att = st["stageId"], st["attemptId"]
        if st.get("numCompleteTasks", 0) < 8:
            continue  # tiny stages: straggler ratio is noise
        try:
            url = (
                f"{base}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.5,1.0"
            )
            with urllib.request.urlopen(url, timeout=10) as r:
                q = json.load(r)
            med, mx = q["executorRunTime"]
            out.append(
                {
                    "stage": sid,
                    "tasks": st["numCompleteTasks"],
                    "median_ms": med,
                    "max_ms": mx,
                    "ratio": round(mx / med, 2) if med > 0 else None,
                }
            )
        except Exception:
            continue
    return out


def main() -> None:
    spark = get_session(
        "scale-rehearsal-dedup", extra_conf={"spark.ui.enabled": "true"}
    )
    corpus = make_corpus(spark, N_ROWS)

    # Phase 1: LSH candidate pairs (guard armed at the default cap)
    t_lsh = time.perf_counter()
    pairs = D.minhash_lsh_pairs(
        corpus, n_hashes=8, bands=4, shingle_k=3, max_bucket_size=MAX_BUCKET
    )
    pairs_df = pairs.df.persist()
    n_pairs = pairs_df.count()
    t_lsh = time.perf_counter() - t_lsh

    # Planted near-dups must be found: (k*1000+501, k*1000+502)
    planted = pairs_df.filter(
        (F.col("id_a") % NEAR_DUP_EVERY == 501)
        & (F.col("id_b") == F.col("id_a") + 1)
        & (F.col("id_a") >= SKEW_CLIQUE)  # clique rows are cap-dropped
    ).count()
    first_k = SKEW_CLIQUE // NEAR_DUP_EVERY  # planted pairs below this are in the clique
    expected_planted = (N_ROWS - 503) // NEAR_DUP_EVERY + 1 - first_k
    # The degenerate clique must NOT appear as pairs (quadratic blowup
    # otherwise: ~5e9 pairs from 100k identical docs)
    clique_pairs = pairs_df.filter(F.col("id_b") < SKEW_CLIQUE).count()

    # Dropped-bucket audit (same construction the guard runs in-plan):
    # bucket sizes over the band hashes, count buckets past the cap.
    sigs = D.minhash_signatures(corpus, n_hashes=8, shingle_k=3).df
    rows = 8 // 4
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "_", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
                )
            ).alias("bh"),
        )
        for b in range(4)
    ]
    buckets = (
        sigs.select(F.explode(F.array(*band_cols)).alias("bx"))
        .groupBy("bx.band", "bx.bh")
        .count()
    )
    dropped_buckets = buckets.filter(F.col("count") > MAX_BUCKET).count()

    # Phase 2: connected components over the candidate pairs
    t_cc = time.perf_counter()
    clusters = D.dedup_clusters(Frame(pairs_df, ()))
    n_clustered = clusters.df.count()
    t_cc = time.perf_counter() - t_cc
    pairs_df.unpersist()

    # Phase 3: corpus-wide paragraph scrub
    t_para = time.perf_counter()
    scrubbed = D.dedup_paragraphs(corpus, sep="\n")
    t_para_exec = run_noop(scrubbed.df)
    t_para = time.perf_counter() - t_para

    stragglers = stage_straggler_report(spark)
    worst = max(
        (s.get("ratio") or 0 for s in stragglers if isinstance(s, dict)),
        default=None,
    )

    result = {
        "n_rows": N_ROWS,
        "lsh_pairs_sec": round(t_lsh, 1),
        "n_candidate_pairs": n_pairs,
        "planted_found": planted,
        "planted_expected": expected_planted,
        "clique_pairs_leaked": clique_pairs,
        "dropped_buckets": dropped_buckets,
        "cluster_sec": round(t_cc, 1),
        "n_clustered_docs": n_clustered,
        "paragraph_dedup_sec": round(t_para, 1),
        "paragraph_exec_sec": round(t_para_exec, 1),
        "worst_straggler_ratio": worst,
    }
    print(json.dumps(result))
    print()
    print("| phase | wall s | detail |")
    print("|---|---|---|")
    print(f"| LSH candidate pairs | {t_lsh:.1f} | {n_pairs:,} pairs; "
          f"planted recall {planted}/{expected_planted}; "
          f"clique leak {clique_pairs}; dropped buckets {dropped_buckets} |")
    print(f"| connected components | {t_cc:.1f} | {n_clustered:,} docs labeled |")
    print(f"| paragraph dedup | {t_para:.1f} | noop sink |")
    print(f"| worst straggler max/median | {worst} | bound: 10x |")
    ok = (
        planted == expected_planted
        and clique_pairs == 0
        and dropped_buckets >= 4  # the planted clique in each of 4 bands
        and (worst is None or worst <= 10)
    )
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
