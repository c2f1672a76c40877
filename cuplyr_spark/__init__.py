"""cuplyr_spark — a PySpark-native analytics engine with the query surface
of bbtheo/cuplyr (dplyr verbs over immutable columnar tables), rebuilt
Spark-first.

The reference (cuplyr 0.1.1) is a single-GPU dplyr backend: R verbs build
an AST that a 6-pass optimizer lowers to libcudf kernels. Here the whole
AST/optimizer/lowering stack is replaced by the PySpark DataFrame API and
Catalyst; this package contributes the *semantics layer* (dplyr verb
behavior: NA rules, join suffix/key rules, union type promotion, stable
sort emulation) plus large-scale training-data-pipeline operators
(deduplication, similarity search, text analysis, multimodal columns)
that the reference lacks.

Quick start::

    from cuplyr_spark import get_session, read_parquet, desc
    from cuplyr_spark import agg as A

    spark = get_session()
    t = read_parquet(spark, "/root/testdata/sf0.01/lineitem.parquet")
    out = (t.filter("l_quantity > 30")
            .mutate(revenue="l_extendedprice * (1 - l_discount)")
            .group_by("l_returnflag")
            .summarise(total=A.sum("revenue"), n=A.n())
            .arrange(desc("total"))
            .collect())
"""

from cuplyr_spark.session import get_session, stop_session
from cuplyr_spark.frame import Frame, desc
from cuplyr_spark.sources.readers import (
    read_parquet,
    read_csv,
    read_json,
    read_orc,
    from_pandas,
    tbl,
    write_parquet_sorted,
    write_parquet_zorder,
)
from cuplyr_spark import agg
from cuplyr_spark.selectors import (
    starts_with,
    ends_with,
    contains,
    matches,
    everything,
    num_range,
    all_of,
    any_of,
    last_col,
    where,
    is_numeric,
    is_integer,
    is_double,
    is_character,
    is_string,
    is_logical,
    is_date,
    is_datetime,
    is_temporal,
)

# Extended operators (temporal / skew / pipeline) re-exported for
# discoverability; the implementing modules carry the design docs.
from cuplyr_spark.operators.asof import asof_join
from cuplyr_spark.operators.events import (
    funnel,
    retention_cohorts,
    sessionize,
    session_stats,
    time_bucket_agg,
    time_bucket_gapfill,
    with_rolling_agg,
    with_running_sum,
)
from cuplyr_spark.operators.rangejoin import range_join
from cuplyr_spark.operators.skew import salted_join, salted_summarise
from cuplyr_spark.operators.stats import histogram, standardize
from cuplyr_spark.pipeline.dedup import (
    dedup_clusters,
    dedup_paragraphs,
    exact_dedup,
    flag_contaminated,
    flag_contaminated_hashed,
    flag_cross_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    near_dedup,
    ngram_jaccard_pairs,
    simhash_signatures,
    with_dup_ngram_frac,
)
from cuplyr_spark.pipeline.multimodal import (
    attach_media_meta,
    decode_images,
    extract_audio_features,
    sample_video_frames,
)
from cuplyr_spark.pipeline.packing import pack_concat_chunks, pack_greedy
from cuplyr_spark.pipeline.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_cosine_topk,
    lsh_cosine_topk,
    quantize_embeddings,
    quantized_cosine_topk,
    semantic_dedup,
    vector_centroids,
)
from cuplyr_spark.sources.connectors import (
    ConcurrentWriteError,
    append_quick_stats,
    append_snapshot,
    delete_append_rows,
    explain_append_scan,
    merge_append_dvs,
    read_append_cdf,
    update_append_rows,
    upsert_append_rows,
    read_append_changes,
    migrate_rename_append_column,
    read_append_snapshot,
    read_snapshot,
    rename_append_column,
    drop_append_column,
    restore_append_snapshot,
    rollback_snapshot,
    set_append_expectations,
    snapshot_versions,
    table_stats,
    upsert_snapshot,
    write_snapshot,
)
from cuplyr_spark.sources.views import (
    append_view_status,
    create_append_view,
    maintain_append_view,
    read_append_view,
    refresh_append_view,
)
from cuplyr_spark.pipeline.text import (
    chunk_documents,
    clean_lines_c4,
    dedup_by_url,
    filter_by_source_quality,
    normalize_url,
    score_linear_classifier,
    tf_idf_top_terms,
    with_fingerprint,
    with_gopher_flags,
    with_lang_id,
    with_pii_scrub,
    with_quality_score,
    with_repetition_stats,
    with_source_stats,
    with_token_counts,
    with_token_rarity,
    with_token_stats,
)
from cuplyr_spark.functions import window as win
from cuplyr_spark.functions.expr import case_when, collate
from cuplyr_spark.agg import across
from cuplyr_spark.pipeline.sampling import (
    deterministic_split,
    resample_to_mixture,
    stratified_hash_sample,
    with_split_label,
)

__version__ = "0.3.0"

__all__ = [
    "get_session",
    "stop_session",
    "Frame",
    "desc",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "from_pandas",
    "tbl",
    "agg",
    "win",
    "across",
    "case_when",
    "collate",
    "starts_with",
    "ends_with",
    "contains",
    "matches",
    "everything",
    "num_range",
    "all_of",
    "any_of",
    "last_col",
    "where",
    "is_numeric",
    "is_integer",
    "is_double",
    "is_character",
    "is_string",
    "is_logical",
    "is_date",
    "is_datetime",
    "is_temporal",
]
