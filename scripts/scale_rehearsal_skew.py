"""25M-row skew rehearsal for the salted paths (VERDICT r5 item 2).

operators/skew.py was the last shipped scale guard never rehearsed at
the BASELINE.md row scale (dedup and ANN both were in r5). This plants
a hot key holding ~30% of a 25M-row fact and measures, for BOTH the
aggregation and the join path:

- wall time, plain vs salted;
- straggler bound (max/median task time per stage, Spark UI REST);
- a correctness checksum that must be IDENTICAL across variants
  (salting must never change results, only placement).

Experimental controls, stated up front because they shape the numbers:

- Join phases set autoBroadcastJoinThreshold=-1: the rehearsal models
  "right side too big to broadcast" (the regime salted_join documents)
  without synthesizing a multi-GB dim locally. A broadcastable right
  side has no skew problem at all.
- join_plain_noaqe / join_salted run with AQE skewJoin DISABLED — the
  unmitigated baseline vs the planner-independent explicit fix.
  join_plain_aqe leaves Spark 4 defaults on, because on a stock
  cluster AQE's runtime skew split is the first line of defense and
  the honest question is what the salt adds beyond it.
- The agg comparison is expected to come out ~EQUAL: Spark partial-
  aggregates (map-side combine) decomposable functions, so a hot key
  collapses to one partial row per map task before the shuffle —
  aggregation skew for sum/count/min/max/mean is already absorbed by
  the engine. salted_summarise exists for engines/paths where that
  combine is unavailable; the rehearsal MEASURES the parity claim
  instead of asserting it.

Each phase runs in its own subprocess/SparkSession (the r5 memory
lesson: phase shuffle files die with the phase JVM).

Usage: python scripts/scale_rehearsal_skew.py [n_rows]
       python scripts/scale_rehearsal_skew.py --phase <name> [n_rows]
Output: one JSON line + a markdown table for BENCH_REFERENCE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from cuplyr_spark import Frame
from cuplyr_spark.operators.skew import salted_join, salted_summarise
from cuplyr_spark.session import get_session
from scale_rehearsal_dedup import _worst, stage_straggler_report


def shuffle_row_imbalance(spark) -> list[dict]:
    """Per-stage max/median SHUFFLE READ ROWS per task — the
    scale-invariant skew signal. local[32] runs all tasks on shared
    cores, so wall-clock ratios understate skew (the median inflates
    under CPU contention); row placement is what survives a 1000-
    executor scale-up, where an idle cluster waits on the one fat
    task."""
    import urllib.request

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    try:
        with urllib.request.urlopen(f"{base}/stages?status=complete", timeout=10) as r:
            stages = json.load(r)
    except Exception as e:  # pragma: no cover
        return [{"error": f"UI REST unavailable: {e}"}]
    out = []
    for st in stages:
        if st.get("numCompleteTasks", 0) < 8:
            continue
        try:
            url = (f"{base}/stages/{st['stageId']}/{st['attemptId']}/taskSummary"
                   "?quantiles=0.5,1.0")
            with urllib.request.urlopen(url, timeout=10) as r:
                q = json.load(r)
            med, mx = q["shuffleReadMetrics"]["readRecords"]
            if mx > 0:
                out.append({
                    "stage": st["stageId"], "tasks": st["numCompleteTasks"],
                    "median_rows": int(med), "max_rows": int(mx),
                    "row_ratio": round(mx / med, 1) if med > 0 else None,
                })
        except Exception:
            continue
    return out


def _worst_rows(imb: list[dict]) -> float | None:
    return max((s.get("row_ratio") or 0 for s in imb if isinstance(s, dict)),
               default=None)

HOT_FRAC_MOD = 10          # id % 10 < 3  -> 30% of rows on the hot key
KEY_SPACE = 1_000_000      # cold keys
RIGHT_ROWS = 2_000_000     # dim side: too big to broadcast (forced)
N_SALTS = 16               # operator default


def fact(spark, n: int) -> Frame:
    """25M-row synthetic fact: key 0 holds 30% of rows (the null-user/
    default-bucket/bot-traffic shape), the rest spread over 1M keys."""
    df = spark.range(n).select(
        F.when(F.col("id") % HOT_FRAC_MOD < 3, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), KEY_SPACE))
        .cast("long")
        .alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    return Frame(df, ())


def dim(spark) -> Frame:
    df = spark.range(RIGHT_ROWS).select(
        F.pmod(F.col("id"), KEY_SPACE).alias("k"),
        (F.col("id") % 83).cast("double").alias("w"),
    )
    return Frame(df, ())


def _session(name: str, skew_join: bool, no_broadcast: bool):
    conf = {"spark.ui.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": str(skew_join).lower()}
    if no_broadcast:
        conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
        conf["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
    return get_session(name, extra_conf=conf)


def _agg_checksum(out) -> dict:
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("total")).alias("s"),
        F.sum(F.col("cnt")).alias("c"),
    ).collect()[0]
    return {"n_groups": row["n"], "sum_total": float(row["s"]), "sum_cnt": row["c"]}


def phase_agg_plain(n: int) -> dict:
    spark = _session("skew-agg-plain", skew_join=True, no_broadcast=False)
    f = fact(spark, n)
    t0 = time.perf_counter()
    out = f.df.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count(F.lit(1)).alias("cnt"),
        F.max("v").alias("mx"),
    )
    chk = _agg_checksum(out)
    sec = time.perf_counter() - t0
    return {"phase": "agg_plain", "sec": round(sec, 1), "checksum": chk,
            "stragglers": stage_straggler_report(spark),
            "row_imbalance": shuffle_row_imbalance(spark)}


def phase_agg_salted(n: int) -> dict:
    spark = _session("skew-agg-salted", skew_join=True, no_broadcast=False)
    f = fact(spark, n)
    t0 = time.perf_counter()
    out = salted_summarise(
        f, ["k"], n_salts=N_SALTS,
        total=("sum", "v"), cnt=("count", None), mx=("max", "v"),
    )
    chk = _agg_checksum(out.df)
    sec = time.perf_counter() - t0
    return {"phase": "agg_salted", "sec": round(sec, 1), "checksum": chk,
            "stragglers": stage_straggler_report(spark),
            "row_imbalance": shuffle_row_imbalance(spark)}


def _join_checksum(joined) -> dict:
    row = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v") * F.col("w")).alias("dot"),
    ).collect()[0]
    return {"n_rows": row["n"], "dot": float(row["dot"])}


def phase_join_plain_noaqe(n: int) -> dict:
    spark = _session("skew-join-plain", skew_join=False, no_broadcast=True)
    t0 = time.perf_counter()
    joined = fact(spark, n).df.join(dim(spark).df, on="k", how="inner")
    chk = _join_checksum(joined)
    sec = time.perf_counter() - t0
    return {"phase": "join_plain_noaqe", "sec": round(sec, 1), "checksum": chk,
            "stragglers": stage_straggler_report(spark),
            "row_imbalance": shuffle_row_imbalance(spark)}


def phase_join_salted(n: int) -> dict:
    spark = _session("skew-join-salted", skew_join=False, no_broadcast=True)
    t0 = time.perf_counter()
    joined = salted_join(
        fact(spark, n), dim(spark), by=["k"], n_salts=N_SALTS, how="inner"
    )
    chk = _join_checksum(joined.df)
    sec = time.perf_counter() - t0
    return {"phase": "join_salted", "sec": round(sec, 1), "checksum": chk,
            "stragglers": stage_straggler_report(spark),
            "row_imbalance": shuffle_row_imbalance(spark)}


def phase_join_plain_aqe(n: int) -> dict:
    spark = _session("skew-join-aqe", skew_join=True, no_broadcast=True)
    t0 = time.perf_counter()
    joined = fact(spark, n).df.join(dim(spark).df, on="k", how="inner")
    chk = _join_checksum(joined)
    sec = time.perf_counter() - t0
    return {"phase": "join_plain_aqe", "sec": round(sec, 1), "checksum": chk,
            "stragglers": stage_straggler_report(spark),
            "row_imbalance": shuffle_row_imbalance(spark)}


PHASES = {
    "agg_plain": phase_agg_plain,
    "agg_salted": phase_agg_salted,
    "join_plain_noaqe": phase_join_plain_noaqe,
    "join_salted": phase_join_salted,
    "join_plain_aqe": phase_join_plain_aqe,
}


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
    results = {p: run_phase_subprocess(p, n) for p in PHASES}

    agg_match = results["agg_plain"]["checksum"] == results["agg_salted"]["checksum"]
    jp, js, ja = (results[p]["checksum"]
                  for p in ("join_plain_noaqe", "join_salted", "join_plain_aqe"))
    join_match = jp == js == ja
    straggler = {p: _worst(results[p]["stragglers"]) for p in PHASES}
    row_ratio = {p: _worst_rows(results[p]["row_imbalance"]) for p in PHASES}

    summary = {
        "n_rows": n,
        "hot_key_frac": 0.3,
        "n_salts": N_SALTS,
        **{f"{p}_sec": results[p]["sec"] for p in PHASES},
        "straggler_ratio": straggler,
        "shuffle_row_ratio": row_ratio,
        "agg_checksum_match": agg_match,
        "join_checksum_match": join_match,
    }
    print(json.dumps(summary))
    print()
    print("| phase | wall s | worst task-time max/median | shuffle-rows max/median | note |")
    print("|---|---|---|---|---|")
    notes = {
        "agg_plain": "partial agg combines the hot key map-side",
        "agg_salted": "two-level salted agg (16 salts)",
        "join_plain_noaqe": "SMJ, AQE skew split OFF — unmitigated",
        "join_salted": "explicit salt, AQE skew split OFF",
        "join_plain_aqe": "Spark 4 defaults (AQE skew split ON)",
    }
    for p in PHASES:
        print(f"| {p} | {results[p]['sec']} | {straggler[p]} | {row_ratio[p]} | {notes[p]} |")
    print(f"| checksums | agg {'MATCH' if agg_match else 'MISMATCH'} | "
          f"join {'MATCH' if join_match else 'MISMATCH'} | — | "
          "salting must never change results |")

    ok = (
        agg_match and join_match
        and (straggler["join_salted"] or 0) < 10
        and (row_ratio["join_salted"] or 99) < 3      # salt bounds placement
        and (row_ratio["join_plain_noaqe"] or 0) > 5  # the hazard is real
    )
    print(f"REHEARSAL {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
