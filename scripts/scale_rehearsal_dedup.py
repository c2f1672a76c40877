"""25M-row scale rehearsal for the dedup path (VERDICT r4 item 5).

Validates the 100 TB skew guards empirically rather than by argument:
runs signatures -> LSH candidate pairs -> connected components, plus a
corpus-wide paragraph scrub, at the BASELINE.md row scale (25M
synthetic docs) with a PLANTED degenerate bucket (100k identical
documents) that must be killed by the LSH bucket cap, and planted
genuine near-dup pairs that must survive it.

Each phase runs in its OWN subprocess/SparkSession (orchestrated by
this same file with no args). That mirrors how a real pipeline stages
this work — signatures are computed once and land in parquet, then
banding/clustering read them back — and keeps the local-mode footprint
bounded: one phase's shuffle files and page cache are freed when its
JVM exits instead of accumulating across the whole pipeline (a single
25M-row session was kernel-OOM-killed at ~113 GB: 64g heap + 56 GB of
tmpfs shuffle from three phases).

Checks:
  - wall time per phase (noop-sink / parquet-sink execution);
  - the skew guard actually dropped the degenerate bucket(s): the
    planted 100k-doc clique would otherwise contribute ~5e9 candidate
    pairs / one quadratic straggler task;
  - recall: the planted near-dup pairs ARE found;
  - straggler bound: for every completed stage with >=8 tasks, max
    task time <= 10x the stage median (Spark UI REST API).

Usage: python scripts/scale_rehearsal_dedup.py [n_rows]
       python scripts/scale_rehearsal_dedup.py --phase {sigs,lsh,cc,para} [n_rows]
Output (orchestrator): one JSON line + a markdown table for
BENCH_REFERENCE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cuplyr_spark import Frame
from cuplyr_spark.pipeline import dedup as D
from cuplyr_spark.session import get_session

SKEW_CLIQUE = 100_000          # identical docs -> one degenerate LSH bucket
NEAR_DUP_EVERY = 1_000         # docs k*1000+501 and +502 share text
MAX_BUCKET = 10_000            # operator default cap
SCRATCH = os.environ.get("REHEARSAL_SCRATCH", "/tmp/rehearsal_scratch")

# Synthetic token space: 4000 distinct "words" (w0..w3999). A toy
# 40-word vocabulary gives a ~64k trigram universe, which at 25M docs
# produces millions of COINCIDENTAL band collisions (a quadratic pair
# blowup no real corpus has); 4000 words -> 6.4e10 trigrams makes
# random band collisions negligible, so candidate pairs are dominated
# by the PLANTED structures — the realistic sparse-near-dup regime.
VOCAB_SIZE = 4000


def make_corpus(spark, n: int) -> Frame:
    """Deterministic synthetic corpus, generated JVM-side (no data
    materialized on the driver). Word choice is hash arithmetic over
    the row id so every run — and every phase process — is identical."""
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
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(anchor * F.lit(salt + 17)), VOCAB_SIZE).cast("string"),
        )

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


def _worst(stragglers: list[dict]) -> float | None:
    return max(
        (s.get("ratio") or 0 for s in stragglers if isinstance(s, dict)),
        default=None,
    )


def _session(name: str):
    return get_session(name, extra_conf={"spark.ui.enabled": "true"})


# -- phases (each its own process) -------------------------------------


def phase_sigs(n: int) -> dict:
    """Corpus -> minhash signatures -> parquet (the compute-once /
    reuse-everywhere staging a real pipeline does)."""
    spark = _session("rehearsal-sigs")
    t0 = time.perf_counter()
    corpus = make_corpus(spark, n)
    sigs = D.minhash_signatures(corpus, n_hashes=8, shingle_k=3)
    sigs.df.write.mode("overwrite").parquet(f"{SCRATCH}/sigs")
    sec = time.perf_counter() - t0
    return {"phase": "sigs", "sec": round(sec, 1),
            "stragglers": stage_straggler_report(spark)}


def phase_lsh(n: int) -> dict:
    """Signatures -> banded candidate pairs (guard armed) -> parquet,
    plus the planted-pair recall / clique-leak / dropped-bucket audit
    — all from the staged signatures, nothing recomputed."""
    spark = _session("rehearsal-lsh")
    from cuplyr_spark.sources.readers import read_parquet

    sigs = read_parquet(spark, f"{SCRATCH}/sigs")
    t0 = time.perf_counter()
    pairs = D.minhash_lsh_pairs(
        sigs, n_hashes=8, bands=4, shingle_k=3,
        max_bucket_size=MAX_BUCKET, sigs=sigs,
    )
    pairs.df.write.mode("overwrite").parquet(f"{SCRATCH}/pairs")
    sec = time.perf_counter() - t0

    pairs_df = read_parquet(spark, f"{SCRATCH}/pairs").df
    n_pairs = pairs_df.count()
    planted = pairs_df.filter(
        (F.col("id_a") % NEAR_DUP_EVERY == 501)
        & (F.col("id_b") == F.col("id_a") + 1)
        & (F.col("id_a") >= SKEW_CLIQUE)  # clique rows are cap-dropped
    ).count()
    first_k = SKEW_CLIQUE // NEAR_DUP_EVERY
    expected = (n - 503) // NEAR_DUP_EVERY + 1 - first_k
    clique_pairs = pairs_df.filter(F.col("id_b") < SKEW_CLIQUE).count()

    # dropped-bucket audit: replay the band construction over the SAME
    # staged signatures (8-byte portable band hash, as the operator)
    rows = 8 // 4
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            D._hash64(
                F.concat_ws(
                    "_", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]
                )
            ).alias("bh"),
        )
        for b in range(4)
    ]
    buckets = (
        sigs.df.select(F.explode(F.array(*band_cols)).alias("bx"))
        .groupBy("bx.band", "bx.bh")
        .count()
    )
    dropped = buckets.filter(F.col("count") > MAX_BUCKET).count()
    return {
        "phase": "lsh", "sec": round(sec, 1), "n_candidate_pairs": n_pairs,
        "planted_found": planted, "planted_expected": expected,
        "clique_pairs_leaked": clique_pairs, "dropped_buckets": dropped,
        "stragglers": stage_straggler_report(spark),
    }


def phase_cc(n: int) -> dict:
    """Candidate pairs -> connected-component cluster labels."""
    spark = _session("rehearsal-cc")
    from cuplyr_spark.sources.readers import read_parquet

    pairs = read_parquet(spark, f"{SCRATCH}/pairs")
    t0 = time.perf_counter()
    clusters = D.dedup_clusters(pairs)
    n_clustered = clusters.df.count()
    sec = time.perf_counter() - t0
    return {"phase": "cc", "sec": round(sec, 1),
            "n_clustered_docs": n_clustered,
            "stragglers": stage_straggler_report(spark)}


def phase_para(n: int) -> dict:
    """Corpus-wide paragraph scrub, executed to a noop sink."""
    spark = _session("rehearsal-para")
    corpus = make_corpus(spark, n)
    t0 = time.perf_counter()
    scrubbed = D.dedup_paragraphs(corpus, sep="\n")
    scrubbed.df.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    return {"phase": "para", "sec": round(sec, 1),
            "stragglers": stage_straggler_report(spark)}


PHASES = {"sigs": phase_sigs, "lsh": phase_lsh, "cc": phase_cc, "para": phase_para}


def run_phase_subprocess(phase: str, n: int) -> dict:
    env = dict(os.environ)
    env.setdefault("CUPLYR_SPARK_DRIVER_MEM", "48g")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", phase, str(n)],
        capture_output=True, text=True, env=env,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"phase {phase} produced no JSON (rc={proc.returncode}):\n"
        + proc.stdout[-2000:] + proc.stderr[-2000:]
    )


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--phase":
        phase, n = argv[1], int(argv[2]) if len(argv) > 2 else 25_000_000
        print(json.dumps(PHASES[phase](n)))
        return

    n = int(argv[0]) if argv else 25_000_000
    os.makedirs(SCRATCH, exist_ok=True)
    results = {p: run_phase_subprocess(p, n) for p in ("sigs", "lsh", "cc", "para")}

    lsh = results["lsh"]
    worst = max(
        (w for w in (_worst(r["stragglers"]) for r in results.values())
         if w is not None),
        default=None,
    )
    summary = {
        "n_rows": n,
        "sigs_sec": results["sigs"]["sec"],
        "lsh_pairs_sec": lsh["sec"],
        "n_candidate_pairs": lsh["n_candidate_pairs"],
        "planted_found": lsh["planted_found"],
        "planted_expected": lsh["planted_expected"],
        "clique_pairs_leaked": lsh["clique_pairs_leaked"],
        "dropped_buckets": lsh["dropped_buckets"],
        "cluster_sec": results["cc"]["sec"],
        "n_clustered_docs": results["cc"]["n_clustered_docs"],
        "paragraph_dedup_sec": results["para"]["sec"],
        "worst_straggler_ratio": worst,
    }
    print(json.dumps(summary))
    print()
    print("| phase | wall s | detail |")
    print("|---|---|---|")
    print(f"| minhash signatures -> parquet | {summary['sigs_sec']} | "
          f"{n:,} docs, computed once, staged for reuse |")
    print(f"| LSH candidate pairs | {summary['lsh_pairs_sec']} | "
          f"{summary['n_candidate_pairs']:,} pairs; "
          f"planted recall {summary['planted_found']}/{summary['planted_expected']}; "
          f"clique leak {summary['clique_pairs_leaked']}; "
          f"dropped buckets {summary['dropped_buckets']} |")
    print(f"| connected components | {summary['cluster_sec']} | "
          f"{summary['n_clustered_docs']:,} docs labeled |")
    print(f"| paragraph dedup | {summary['paragraph_dedup_sec']} | noop sink |")
    print(f"| worst straggler max/median | {worst} | bound: 10x |")
    ok = (
        summary["planted_found"] == summary["planted_expected"]
        and summary["clique_pairs_leaked"] == 0
        and summary["dropped_buckets"] >= 4  # the planted clique in each band
        and (worst is None or worst <= 10)
    )
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
