"""Named query registry — the driver contract (SURVEY.md §2, §5.2).

Every implemented operator gets a named query here: a PySpark DataFrame
builder ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB ANSI SQL the driver uses as the correctness oracle.

Determinism rules (FIXTURES.md §3) enforced throughout:
  * money/count sums go through exact DECIMAL accumulation, then one cast to
    DOUBLE — bit-identical across engines regardless of summation order;
  * irrational similarity scores are rounded to 6 decimals in both engines;
  * every integer output is BIGINT in both engines (Spark ints are cast);
  * per-group rankings always carry a unique tie-break key;
  * list outputs are rendered as comma-joined sorted strings (engine-neutral).
"""

from __future__ import annotations

from ._registry import REGISTRY, QuerySpec, register  # noqa: F401

# family modules register on import; the import order is the
# registry tail order (priority names are pinned explicitly
# in _PRIORITY below, so only never-sampled stragglers ride
# on module order)
from . import (  # noqa: E402,F401
    relational,
    knn_exact,
    multimodal,
    text,
    pipeline,
    streaming,
    store,
    query_api,
    query_nodes,
)

# the header imports come AFTER the family-module imports: a
# header name may shadow a submodule name in this namespace
# (operators' `knn` would make `from . import knn` skip the
# submodule), and flagship() below needs the header bindings


from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import knn
from ..sources import load_table


# ---------------------------------------------------------------------------
# registry ordering — the driver adjudicates at most 50 queries per round and
# walks the registry in insertion order, so names that have never received a
# driver CORRECTNESS row register first, then names whose last green row is
# oldest (r02, not sampled in r03).  Unlike round 3's silent `if n in
# REGISTRY` filter, _reordered() now FAILS LOUDLY on a priority name that
# doesn't exist (VERDICT r3 §"What's wrong" #3).
# ---------------------------------------------------------------------------

_PRIORITY = [
    # new this round (round 15) — never driver-adjudicated
    "store_neardup_index", "store_neardup_refresh", "store_neardup_probe",
    "pipe_dataset_build_v2", "pipe_substring_dedup",
    "store_snapshot_screen_ingest",
    "store_simhash_index", "store_simhash_refresh",
    # rounds 13-14 — registered for two rounds but the driver sampled the
    # identical 50 names both times (VERDICT r14 task 7): promote to the
    # head so they finally receive a CORRECTNESS row
    "api_quantized_no_rescore", "api_quantized_oversampling",
    "api_search_matrix_pairs", "api_search_matrix_offsets",
    "store_mv_probe_per_token", "dedup_duplicate_clusters",
    "pipe_dataset_build_neardup", "dedup_cluster_keep_quality",
    "pipe_domain_mix_temperature", "dedup_minhash_lsh_capped",
    "pipe_gopher_rules",
    # round 12
    "api_query_rescore_maxsim", "api_query_hybrid_sparse_dense",
    "api_query_groups_nested", "api_query_mmr", "api_query_batch",
    "pipe_paragraph_dedup", "pipe_pii_scrub", "api_query_groups_text",
    "api_query_groups_sparse",
    # new in round 11
    "api_query_rescore_nearest",
    "api_query_nested_prefetch", "api_recommend_euclid",
    "api_discover_manhattan",
    # new in round 10
    "store_indexed_bq", "store_mv_indexed_bq", "knn_manhattan_metric",
    "api_text_stopword_indexed", "api_text_stemmed_indexed", "knn_mmr_k2",
    "store_bq_filtered_indexed", "api_recommend_sum_scores",
    "api_recommend_groups", "api_recommend_groups_avg",
    "store_discover", "store_context",
    # new in round 9
    "api_match_phrase_indexed", "api_text_prefix_indexed",
    "api_match_text_word", "store_mv_indexed_sq", "store_tenant_mv_indexed",
    "store_mv_indexed_pq",
    "api_scroll_range_indexed", "api_scroll_filtered_range_indexed",
    # new in round 8
    "api_formula_boost", "api_formula_decay",
    "api_range_indexed", "api_datetime_range_indexed",
    "store_range_indexed_search", "store_multivector_indexed",
    "api_search_with_vectors", "api_scroll_pages",
    "store_nested_filter_indexed", "api_sparse_idf",
    "store_mv_filtered_indexed", "api_hasid_hasvector", "api_retrieve",
    "api_match_text_indexed", "api_geo_indexed",
    # new in round 7 — last adjudicated one round ago
    "store_filtered_indexed_search", "api_filter_nested",
    "api_geo_polygon", "knn_multivector_maxsim",
    "store_multivector_search", "store_delete_vectors",
    "api_search_with_payload", "api_sparse_filtered",
    "api_text_filtered", "store_indexed_sq",
    "store_indexed_probe", "api_recommend_best_score", "api_match_phrase",
    "store_indexed_pq", "knn_mmr_rerank", "api_search_groups",
    "api_search_groups_stored",
    # new in round 6
    "api_filter_dsl", "store_filter_dsl_indexed", "api_geo_search",
    "api_query_dbsf", "store_update_vectors", "store_tenant_search",
    "api_values_count", "api_datetime_range",
    "api_group_lookup", "api_query_by_id", "store_batch_update",
    "api_sample",
    "store_tenant_indexed", "api_search_params", "pipe_dataset_build",
    "t14_stream_tenant_ingest",
    "api_context_search",
    "store_array_payload_search", "pipe_token_shards",
    # new in round 5
    "store_indexed_search", "store_index_refresh", "text_bm25_indexed",
    "text_bm25_refresh", "t12_queue_multi_source", "sparse_knn_text",
    "api_sparse_search", "api_discover", "api_facet", "api_scroll_order_by",
    "api_distance_matrix", "store_snapshot_restore", "store_sparse_indexed",
    "t13_stream_index_refresh", "text_repetition_stats",
    "store_payload_search", "store_alias_switch", "api_match_text",
    "pipe_decontaminate", "pipe_stratified_sample", "api_query_fusion",
    # last green in r03, not sampled by the driver in r04 — oldest evidence
    "knn_cosine_topk100", "knn_lsh_brp", "knn_filtered_search",
    "a1_pricing_summary", "j1_customer_revenue", "j2_customers_per_region",
    "j3_customer_order_counts", "j4_semi_customers_with_orders",
    "j4_anti_parts_never_bulk_ordered", "w1_top3_orders_per_priority",
    "o2_top100_lineitems", "x3_hash_embed_tf", "dedup_exact_groups",
    "a5_label_centroids", "f1_json_payload_stats", "t3_hourly_event_windows",
    "w2_event_gaps", "w3_running_customer_spend", "w4_price_quartiles",
    "a2_distinct_parts_suppliers", "a2_approx_distinct_parts",
    "a3_user_event_types", "a4_rollup_pricing", "a6_value_percentiles",
    "mm_byte_histogram", "mm_audio_features", "mm_resize_pipeline",
    "mm_binaryfile_source", "s1_message_roundtrip",
    "s6_upsert_last_write_wins", "s7_dead_letter_routing",
    "p4_payload_filter", "p5_payload_enrichment", "f3_f4_content_ids",
    "f8_array_gauntlet", "x4_centroids_applyinpandas", "x1_text_embed_udf",
    "j9_regional_revenue", "j10_small_quantity_revenue", "text_top_ngrams",
    "a7_salted_event_stats", "api_retrieve_by_ids", "api_recommend",
    "pipe_corpus_clean", "pipe_split_counts", "pipe_hash_sample",
    "t1_stream_ingest_roundtrip", "t6_stream_watermarked_windows",
    "t8_stateful_user_stats",
]


def _reordered() -> dict[str, QuerySpec]:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(
            f"_PRIORITY names missing from REGISTRY (promised but not "
            f"implemented): {missing}")
    head = {n: REGISTRY[n] for n in _PRIORITY}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _reordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _reordered().items() if spec.oracle}


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """entry() smoke query: full pipeline — documents → deterministic hash
    embed (X3) → kNN top-k join against the embeddings fixture (J5/W1)."""
    from ..operators.embed import hash_embed  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    doc_vecs = docs.select(
        F.col("doc_id").alias("qid"), hash_embed(F.col("text"), 64).alias("qvec")
    ).filter(F.col("qid") < 8)
    emb = load_table(spark, sf_dir, "embeddings")
    return knn.knn_join_vectorized(doc_vecs, emb, k=5, exclude_self=False)
