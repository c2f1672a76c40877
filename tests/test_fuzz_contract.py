"""Randomized data fuzz for the non-TPC-H contract families
(events / documents / embeddings) — the driver-blind-spot extension of
tests/test_fuzz_tpch.py.

Each trial hash-SAMPLES the three behavioral tables per seed (rows
removed, never duplicated: entry queries rely on unique
event_id/doc_id/vec_id for deterministic tie-breaks, and a sampled
subset preserves that invariant while changing every session gap,
window frame, join fanout, LSH bucket, and top-k frontier). The same
entry query and oracle SQL then run over the sampled tables and must
agree exactly.

TPC-H tables are copied whole — that family has its own fuzz with
dangling-FK / duplication / NULL perturbations.
"""

from __future__ import annotations

import glob
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__ as entrymod  # noqa: E402
from check_contract import compare  # noqa: E402

SRC = "/root/testdata/sf0.001"

SAMPLED = {
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# Oracle-bearing queries over the sampled tables. Kept to the ones
# whose semantics do not assume a particular corpus size — everything
# here must be exact under ANY subset of rows.
QUERIES = [
    # events family: windows, sessions, funnels, interval joins
    "events_running_sum",
    "events_sessionize",
    "events_hourly_rollup",
    "events_rolling_24h",
    "events_json_extract",
    "funnel",
    "retention_cohorts",
    "window_rank",
    "window_lag_lead",
    "cumulative_stats",
    "asof_join",
    "asof_nearest",
    "range_join_sessions",
    # documents family: dedup + text pipeline
    "dedup_exact",
    "url_dedup",
    "paragraph_dedup",
    "minhash_lsh_pairs",
    "cross_corpus_dedup",
    "dup_ngram_frac",
    "substring_dedup_spans",
    "substring_dedup_trim",
    "doc_chunks",
    "doc_classifier",
    "text_token_stats",
    "text_quality",
    "unigram_logprob",
    "c4_line_clean",
    # embeddings family: similarity + quantization
    "embedding_cosine_topk",
    "embedding_quantize",
    "quantized_cosine_topk",
    "ivf_cosine_topk",
    "ivf_staged_centroids",
    "ivf_index_search",
    "ivf_index_append",
    "embedding_clusters",
    "cluster_balanced_sample",
    "lsh_cosine_topk",
]


def _build_dir(tmp_path, seed: int) -> str:
    out = str(tmp_path / f"contract_fuzz_{seed}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    keep_mod = 3 + seed % 3  # keep 2/3 .. 4/5 of rows
    for path in glob.glob(os.path.join(SRC, "*.parquet")):
        t = os.path.basename(path).replace(".parquet", "")
        key = SAMPLED.get(t)
        where = (
            f"WHERE hash({key} + {seed}) % {keep_mod} != 0" if key else ""
        )
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{path}') {where}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return out


@pytest.mark.parametrize("seed", [7, 23])
def test_contract_fuzz_vs_duckdb(spark, tmp_path, seed):
    sf_dir = _build_dir(tmp_path, seed)
    con = duckdb.connect()
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(path).replace(".parquet", "")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name in QUERIES:
        got = qs[name](spark, sf_dir).toPandas()
        want = con.execute(oracles[name]).fetchdf()
        ok, note = compare(name, got, want)
        if not ok:
            failures.append(f"{name}: {note}")
    con.close()
    assert not failures, f"seed={seed} divergences:\n" + "\n".join(failures)
