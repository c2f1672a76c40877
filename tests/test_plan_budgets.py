"""Plan-regression guardrail: hard pytest assertions on the physical
plan of every contract query (the CI version of scripts/audit_plans.py).

What fails here instead of waiting for a judge:
- an exchange-count regression past the per-query budget (shuffles are
  THE scale cost — a new exchange that slips into a plan is a 100 TB
  bottleneck even when sf0.001 results stay correct);
- any CartesianProduct anywhere;
- any unpartitioned WindowExec over a non-tiny input (single-task
  global sort — the anti-pattern fixed in bind_cols/filter_mask);
- missing parquet filter pushdown on the scan-heavy queries.

Budgets are the audited exchange counts at the time the query's plan
was last reviewed (NOT aspirations): raise one only with a plan-shape
justification in the commit.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# name -> max allowed Exchange nodes in the formatted physical plan,
# at the test conditions (sf0.001, local[8], 8 shuffle partitions).
# Audited 2026-08-13 (round 2) — these are the OBSERVED counts, not
# aspirations; dims broadcast at this scale, so joins cost 0 exchanges.
EXCHANGE_BUDGETS = {
    "filter_select": 0,
    "select_where_numeric": 0,  # r5: type-predicate projection, map-only
    "arrange_collated": 0,      # r5: collated sort + head -> TakeOrderedAndProject
    "doc_chunks": 0,            # r5: sequence+posexplode+substring, map-only
    "doc_classifier": 0,        # r5: hashing-trick weights, map-only
    "dup_ngram_frac": 2,        # r5: gram-key window + doc-grain agg; join back broadcasts
    "embedding_quantize": 0,    # r5: per-row quantization, map-only
    "quantized_cosine_topk": 1, # r5: broadcast q side; per-query window rank
    "c4_line_clean": 0,         # r5: array-filter lambda, map-only
    "url_dedup": 1,             # r5: one hash-agg on the normalized key
    "near_dedup_survivors": 2,  # r5: LSH window shuffle + anti-join (CC ran eagerly)
    "cross_corpus_dedup": 3,    # r5: existing-bucket agg + two semi-join flags
    "nest_join": 1,             # r5: right-side pack agg; join broadcasts
    "semantic_dedup": 2,        # r5: block window guard + survivor anti-join (CC ran eagerly)
    "group_modify_trimmed": 1,  # r5: one group-key shuffle into applyInPandas
    "streaming_stream_join": 0, # r5: memory-sink table scan (join ran in the stream)
    "profile_lineitem": 2,      # r5: multi-countDistinct expand: partial+final agg
    "rows_upsert": 0,           # r5: key join + union; tiny y broadcasts
    "rows_patch": 0,            # r5: key join; tiny y broadcasts
    "rows_delete": 0,           # r5: anti-join; tiny y broadcasts
    "filter_col_op_col": 0,
    "mutate_arithmetic": 0,
    "mutate_if_else": 0,
    "arrange_topk": 0,          # TakeOrderedAndProject, no shuffle
    "group_summarise": 1,       # partial+final hash agg
    "expr_in_aggregate": 1,
    "ungrouped_summarise": 2,   # count-distinct: expand + final
    "inner_join": 0,            # dim side broadcasts
    "left_join": 0,
    "right_join": 0,
    "full_join": 2,             # two grouped aggs; outer merge reuses them
    "semi_join": 0,
    "anti_join": 0,
    "multikey_self_join": 0,    # filtered side broadcasts
    "bind_rows": 0,             # union is shuffle-free
    "distinct": 1,
    "count": 1,
    "intersect_setdiff": 4,
    "window_topn_per_group": 1, # keyed window
    "date_parts": 1,
    "workflow_complete": 1,
    "join_agg_pipeline": 2,     # fact-fact join + agg; dims broadcast
    "dedup_exact": 1,
    "text_token_stats": 0,
    "text_quality": 0,
    "text_lang_id": 0,
    "text_fingerprint": 0,
    "text_token_rarity": 4,     # tf-grain agg + df agg + tok join + doc agg, all slim rows
    "unigram_logprob": 4,       # r7: tf agg + corpus-count agg + term join + doc agg (rarity template); (T,V) scalars are driver literals
    "text_gopher_quality": 0,
    "text_repetition": 0,
    "pii_scrub": 0,
    "sequence_pack": 1,         # one hash-partition on the shard key
    "sequence_pack_greedy": 1,  # groupBy(shard) applyInPandas; join-back broadcasts
    "decontaminate": 2,         # bench-gram distinct + hit-id distinct (ids only)
    "decontaminate_hashed": 3,  # + exact-verify join of prefilter survivors (bench grams not broadcast in this variant)
    "paragraph_dedup": 2,       # para-keyed window (both windows share it) + id-keyed rebuild agg; rejoin broadcasts at test sf
    "mixture_resample": 3,      # tiny count agg + global min + re-agg; corpus side map-only
    "mixture_resample_tokens": 3,  # r14: same shape with sum(weight) instead of count(*); corpus side map-only
    "minhash_signatures": 1,    # repartition spread for the md5 fold
    "simhash": 0,
    "ngram_jaccard_pairs": 3,  # r4: LSH bucket-cap window guard; self-join broadcasts at test sf (dup subtree), SMJ+reuse at scale
    "embedding_cosine_topk": 1, # broadcast queries + per-query window
    "embedding_label_centroid_sim": 1,
    "events_running_sum": 1,
    "events_sessionize": 1,
    "events_hourly_rollup": 1,
    "events_json_extract": 0,
    "asof_join": 1,
    "minhash_lsh_pairs": 5,  # r4: _par spread + window bucket guard, both duplicated under the broadcast self-join at test sf, + pair distinct
    "embedding_near_dup": 2,    # r4: bucket-cap window guard (one slim shuffle, dup'd under broadcast self-join); label-blocked join itself broadcasts
    "lsh_cosine_topk": 1,
    "pivot_wider": 2,           # distinct discovery + pivot agg
    "pivot_longer": 0,
    "bind_cols": 2,             # one keyed-window shuffle per zip branch
    "cast_types": 0,
    "median": 1,
    "grouped_mutate": 1,
    "salted_agg": 2,            # two-level salted agg
    "tpch_q6": 1,
    "tpch_q3": 1,
    "tpch_q1": 2,               # partial+final agg + 2-key result sort
    "tpch_q4": 3,               # distinct + count agg + sort (joins broadcast)
    "tpch_q5": 4,               # r5: supp/cust hints dropped (oversized-broadcast fix) — static plan shows SMJ exchanges; AQE converts to broadcast at runtime when actually small
    "tpch_q10": 3,              # r5: customer hint dropped (oversized-broadcast fix) — static SMJ exchanges, AQE broadcasts at runtime; top-20 is TakeOrderedAndProject
    "tpch_q14": 1,              # single ungrouped agg
    "tpch_q18": 1,              # order-grain agg; joins broadcast; top-100 TOP
    "tpch_q7": 2,               # agg + sort; nation-tagged dims broadcast
    "funnel": 1,                # one user-key shuffle (cascaded windows + agg)
    "retention_cohorts": 2,     # user window + (cohort, offset) agg
    "events_rolling_24h": 1,    # keyed range-frame window
    "range_join_sessions": 1,   # session window reused; bucket join broadcasts
    "tpch_q19": 1,              # broadcast part join + single agg
    "tpch_q8": 4,               # r5: asia_cust/part/supp hints dropped (oversized-broadcast fix) — AQE picks broadcast at runtime when small
    "tpch_q13": 3,              # per-cust agg + count-of-counts + sort
    "tpch_q15": 4,              # quarter agg + global max + supplier join + sort
    "tpch_q17": 3,              # r5: avg_qty hint dropped (scales with part count) — agg output already partitioned on l_partkey, SMJ reuses it; part broadcast
    "salted_join": 2,           # salted equi-join + segment agg
    "tpch_q2": 5,               # int-key offer agg + part-min window + winner dim joins + sort
    "tpch_q9": 2,               # dims broadcast; (nation, year) agg + sort
    # r16 x8 compute leg: same shapes as the base entries over the
    # 8x-inflated inputs (the inflation explode is map-side)
    "minhash_signatures_x8": 1,
    "minhash_lsh_pairs_x8": 5,
    "decontaminate_hashed_x8": 3,
    "paragraph_dedup_x8": 2,
    "tpch_q9_x8": 2,
    "tpch_q11": 4,              # per-part value agg + global scalar + threshold sort
    "tpch_q12": 2,              # orders join (2 cols) + linestatus agg
    "tpch_q16": 4,              # distinct pair grain + attr-group countDistinct
    "tpch_q20": 6,              # shared li96 feeds per-supp/per-part aggs + semi up
    "tpch_q21": 5,              # order-grain verdict agg + blamed join + supplier rollup
    "tpch_q22": 3,              # scalar avg + anti-join + cntry agg
    "source_quality_gate": 2,   # source-grain stats agg + join back
    "dedup_cluster_labels": 0,  # final plan reads the CC localCheckpoint
    "media_metadata": 0,        # per-row binary hash, map-only
    "video_frame_sample": 0,    # mapInPandas chunk decode, map-only
    "audio_features": 0,        # mapInPandas windowed PCM sums, map-only
    "asof_nearest": 1,          # union + two same-key windows, one shuffle
    "tfidf_top_terms": 6,       # tf agg + df re-agg + n_docs + doc window; term-grain rows only
    "standardize": 1,           # tiny moments agg broadcast back
    "histogram": 1,             # map-side bucket + partial+final count
    "fill_down": 1,
    "unite_separate": 0,
    "train_test_split": 0,
    "stratified_sample": 0,
    "window_rank": 1,
    "window_lag_lead": 1,
    "cumulative_stats": 1,
    "rollup_agg": 1,
    "cube_agg": 1,
    "nest_unnest": 1,
    "slice_head_grouped": 1,
    "string_functions": 0,
    "vector_centroid": 2,       # per-(group,dim) partial agg + reassembly
    "ivf_cosine_topk": 1,       # r6: literal-centroid map-side assign/probe — only the rank window exchanges
    "ivf_staged_centroids": 1,  # r6: literal staged centroids; only the rank window exchanges
    "ivf_index_search": 1,      # r7: probe-pruned index scan; only the rank window exchanges (probes broadcast)
    "ivf_index_append": 1,      # r7: map-side delta assign + union; only the rank window exchanges
    "substring_dedup_spans": 2, # r7: gram-keyed window (both counts share it) + doc-keyed islands; span agg reuses doc partitioning. r8: opt-in max_gram_freq guard adds a freq-agg exchange when enabled — off here per the measured default
    "substring_dedup_trim": 2,  # r7: same two shuffles; span pack + corpus rejoin broadcast at test sf
    "embedding_clusters": 0,    # r6: literal-centroid greatest() argmax — pure map
    "cluster_balanced_sample": 1,  # r7: map-side assign; one cell-keyed rank window over slim rows
    "complete_fill": 2,         # per-key distinct grids + grid join
    "snapshot_compact": 1,      # r7: scan of the compacted version + one agg shuffle (staging writes run eagerly inside the callable)
    "snapshot_schema_evolution": 0,  # r7: pure scan of the evolved published version (merge ran eagerly at staging time)
    "append_snapshot": 1,       # r7: multi-segment-compacted scan + one agg shuffle (appends/compaction ran eagerly at staging time)
    "append_snapshot_incremental": 1,  # r8: change-feed scan of the two raw delta segments + one agg shuffle (log walk is manifest metadata)
    "append_snapshot_partitioned": 0,  # r8: partition-pruned scan of the folded segment, map-only (appends/compaction ran eagerly at staging time)
    "histogram_shard_quantiles": 5,    # r8: (flag,shard)-sketch agg + per-flag merge agg + exact-percentile agg + the 3-row-vs-3-row verification join (2). The exact-percentile side exists only to pin the bound flags; a production pipeline runs sketch+merge alone (2 exchanges, sketch rows on the wire)
    "approx_distinct_users": 3,  # r8: two-phase distinct agg (keys+group partial, group final) + output sort
    "sketch_shard_distinct": 5,  # r8: shard-sketch agg + sketch-union agg + two-phase exact distinct (the verification side) + output sort; 5-row join broadcasts
    "heavy_hitter_tokens": 1,    # r8: one hash agg on (tok) with map-side combine; top-k is TakeOrderedAndProject
    "incremental_cross_dedup": 3,  # r8: same three as cross_corpus_dedup (existing-bucket agg + two semi-join flags); append/compaction staging ran eagerly
    "zone_map_prune": 1,  # r10: one global agg over the stats-pruned scan; staging (appends + fold) runs eagerly before the plan
    "sidecar_table_stats": 12,  # r10: all exchanges ride 1-row sidecar frames (collect_list folds + two 1-row verification joins); the only data-scale pass is the exact-percentile agg over events. The audit's BroadcastNestedLoopJoin here is the constant-key join of two GLOBAL AGGREGATES — both sides are exactly 1 row at ANY data scale, so the nested loop is 1x1 by construction, not a scale hazard
    "dictionary_prune": 1,  # r10: one global agg over the dictionary-pruned scan; staging appends run eagerly
    "bloom_point_lookup": 2,  # r10: bloom-pruned scan + orderBy (range exchange, AQE-counted); the sidecar probe is a separate tiny segment-count-bounded job
    "date_functions": 0,
    "quantile_agg": 1,
    "append_delete_rows": 1,  # r11: one grouped agg over the DV-filtered scan (the DV anti-join broadcasts); delete staging runs eagerly
    "append_update_rows": 1,  # r11: same shape — grouped agg over the merged scan; DV + new-segment staging eager
    "join_pruned_read": 2,  # r11: count_distinct expand (partial+final) over the key-pruned scan; the dim join broadcasts
    "time_gapfill": 2,  # r11: rollup hash agg + group-keyed exchange shared by the grid join and the fill windows
    "separate_rows": 1,  # r11: explode is map-side; one hash agg on the exploded tag
    "uncount": 1,  # r11: sequence+explode map-side; one grouped agg
    "append_upsert_rows": 1,  # r11: grouped agg over the merged scan; the DV broadcast anti-join is map-side
    "append_cdf": 1,  # r11: one grouped agg over the unioned typed feed; per-version scans + address semi-joins are broadcast/map-side
    "incremental_view": 0,  # r12: the VIEW READ is a pinned state scan + projection — refresh work happened at maintenance time (that's the point); DV applies broadcast
    "append_expectations": 1,  # r12: one grouped agg over the expectation-filtered table read (validation ran at write time, one agg pass per batch)
    "append_schema_evolution": 2,  # r12: grouped agg over union(clean scan, DV-anti-joined scan) — the union blocks one partial-agg pushdown; DV apply broadcasts
    "append_dv_partitioned": 3,  # r12: per-segment partitioned scans unioned (clean + two DV-carrying parts) under one grouped agg; all DV anti-joins broadcast
    "append_read_where": 1,  # r12: one grouped agg over the predicate-pruned scan (derived stats_filter skips the pre-1995 segment)
    "append_clustered_probe": 1,  # r12: grouped agg over the file-pruned DV-anti-joined scan; DV apply broadcasts, write-side range shuffles ran eagerly
    "append_quick_stats": 0,  # r12: a createDataFrame literal — the numbers came from manifest metadata, no scan exists to shuffle
    "append_restore": 1,  # r12: one grouped agg over the restored multi-path scan (the restore itself is a metadata publish)
    "append_unique_ingest": 1,  # r12: grouped agg over the deduped table; the unique probe + anti-join ran eagerly at write time
    "append_decimal_prune": 1,  # r13: grouped agg over the decimal-zone-map-pruned DV-carrying scan; DV apply broadcasts
    "append_type_widening": 1,  # r13: grouped agg over the two-era multi-path scan read through the widened schema
    "incremental_view_distinct": 0,  # r13: the view read is a pinned state scan + hll estimate projection; refresh work ran at maintenance time
    "append_partition_range": 1,  # r13: grouped agg over the partition-range-pruned directory scan
    "append_partition_range_int": 1,  # r14: grouped agg over the TYPED-range-pruned int-partitioned scan (dir values parse to ints before ordering)
    "append_rename_column": 1,  # r14: grouped agg over the two-ERA union scan (one relation per column-name era, aliased to the head schema)
    "dsir_importance": 5,  # r13: ONE tf shuffle + two vocab-grain count aggs + doc-grain reduce + the left join back to ids — occurrences ride a shuffle once; both model joins run at tf grain
    "dsir_selected_set": 5,  # r14: the dsir_importance plan + TakeOrderedAndProject — the top-k selection adds ZERO exchanges (per-partition heap + driver merge, no global sort)
    "perplexity_buckets": 4,  # r14: the unigram_logprob template (tf agg + count agg + term join + doc agg); bucket assignment is map-side against driver-literal thresholds — the staging sort ran eagerly over slim (score,id) pairs
    "near_dedup_keep_best": 5,  # r14: labels read from the CC localCheckpoint; the keep-best argmax is a cluster-partitioned window over members only (labels⋈scores + window + the losers anti-join; quality itself is column math on the corpus scan)
    "chunk_documents_tokens": 0,  # r14: split → sequence → explode → slice, pure map-side — zero shuffles by construction
    "append_multimodal_columns": 1,  # r15: grouped agg over the compacted nested-column scan (binary/struct/array payload; the evolve/DV/compact work ran eagerly at write time)
}

# Queries whose plan legitimately contains an unpartitioned window over
# a by-construction tiny input (post-limit / post-agg). None currently.
TINY_GLOBAL_WINDOW_OK: dict[str, int] = {}

SKIP = {
    "streaming_sessionize",
    "streaming_windowed",
    "streaming_static_join",
    "streaming_dedup_keys",
    "streaming_running_total",
    "streaming_decontaminate",
}  # streaming plans print differently


@pytest.fixture(scope="module")
def plans(spark):
    entrymod._TABLE_CACHE.clear()
    out = {}
    for name, fn in entrymod.queries().items():
        if name in SKIP:
            continue
        df = fn(spark, SF_DIR)
        out[name] = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    return out


def test_all_queries_have_budgets(plans):
    missing = sorted(set(plans) - set(EXCHANGE_BUDGETS))
    assert not missing, (
        f"queries without an exchange budget: {missing} — audit the plan "
        "and add an entry to EXCHANGE_BUDGETS"
    )


def test_exchange_budgets(plans):
    over = []
    for name, plan in plans.items():
        budget = EXCHANGE_BUDGETS.get(name)
        if budget is None:
            continue
        n = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        if n > budget:
            over.append(f"{name}: {n} exchanges > budget {budget}")
    assert not over, "exchange budget regressions:\n" + "\n".join(over)


def test_no_cartesian_product(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"CartesianProduct in plans: {bad}"


_WINDOW_ARGS = re.compile(
    r"^\(\d+\) Window\n(?:[^\n]*\n)*?Arguments: \[[^\]]*\], \[\]", re.M
)


def test_no_unpartitioned_window(plans):
    """A Window with an empty partition spec serializes the whole input
    through one task. Only whitelisted tiny-input windows pass."""
    bad = []
    for name, plan in plans.items():
        hits = len(_WINDOW_ARGS.findall(plan))
        allowed = TINY_GLOBAL_WINDOW_OK.get(name, 0)
        if hits > allowed:
            bad.append(f"{name}: {hits} unpartitioned windows (allowed {allowed})")
    assert not bad, "\n".join(bad)


def test_scan_pushdown(plans):
    """Filters must reach the parquet scan on scan-heavy queries."""
    for name in ("filter_select", "tpch_q6"):
        plan = plans[name]
        m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert m and m.group(1).strip(), f"{name}: no filters pushed to scan"


def test_dims_broadcast(plans):
    """Dimension joins must be broadcast, not shuffled (join_agg and
    tpch_q3 join customer/nation dims)."""
    for name in ("join_agg_pipeline", "tpch_q3"):
        assert "BroadcastHashJoin" in plans[name], f"{name}: dim join not broadcast"


# Queries whose plans contain explicit Frame.broadcast() hints. At the
# driver's check scale (sf0.1) none of them may trip the oversized-hint
# guard: since r5 the guard DROPS an oversized hint (warn + no-op), so
# a warning here means an explicit hint sits on an SF-scaling side —
# the tpch_q5/q8 class of 100 TB scale-killer fixed this round.
BROADCAST_HINTED = [
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q14",
    "tpch_q15",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "join_agg_pipeline",
    "embedding_cosine_topk",
    "decontaminate",
    # r7: pipeline broadcasts routed through the shared guard — none
    # may warn at the driver's check scale
    "decontaminate_hashed",
    "quantized_cosine_topk",
    "ivf_cosine_topk",
    "ivf_index_search",
]


def test_no_oversized_broadcast_hint_at_sf01(spark):
    """Building every broadcast-hinted contract query at sf0.1 must not
    trip Frame.broadcast()'s size guard (which would drop the hint and
    warn). Plan construction only — no execution needed; the guard
    fires at .broadcast() call time."""
    import warnings

    import __spark_entry__ as em

    em._TABLE_CACHE.clear()
    qs = em.queries()
    with warnings.catch_warnings():
        warnings.filterwarnings("error", message=".*hint dropped.*")
        for name in BROADCAST_HINTED:
            qs[name](spark, "/root/testdata/sf0.1")
