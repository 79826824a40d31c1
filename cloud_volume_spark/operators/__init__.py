"""Relational + training-data-pipeline operators.

Each module exposes ``QUERIES: {name: fn(spark, sf_dir) -> DataFrame}``
and ``ORACLE_SQL: {name: str}`` (DuckDB-runnable ANSI SQL computing the
same result with the same column names). ``__spark_entry__.py``
aggregates them for the driver's correctness gate.
"""

from cloud_volume_spark.operators import (  # noqa: F401
    corpus, curation, dedup, relational, similarity, text, voxel_rel,
)
from cloud_volume_spark import multimodal

# Registration order matters: the correctness driver validates the first 50
# registered queries; the order rotates per round so every query gets a
# driver row across consecutive rounds, with tests/test_oracle_parity.py
# running ALL queries against DuckDB as the local backstop.
#
# Since round 12 the window composition is EXPLICIT: DRIVER_FRONT below
# lists the keys forced to the registry head, in order; the rest follow
# in ALL_MODULES order (dict.update keeps first-insertion positions).
# The invariant — every query OUTSIDE the first 50 has a green row in
# the UNION of the two most recent committed CORRECTNESS_r*.json files
# (so committing a round's artifact and rotating DRIVER_FRONT need not
# be atomic, per the round-12 advice) — is mechanically enforced by
# tests/test_registry_invariants.py. To rotate next round: put the
# queries whose last driver row is oldest (plus every NEW query) into
# DRIVER_FRONT, keep it at <= 50 entries, and let the module order pad
# the window.
#
# ROUND-15 ROTATION (executing round-14's precomputed prescription
# verbatim — the r14 verdict marks this mandatory because most of the
# round-14 rewrites, q2/q20/the minhash family/the ivf pair/the
# embedding family/semantic_dedup/events_conversion_lag, sat OUTSIDE
# the r14 window and must be driver-re-certified): the front is
# exactly the r14 out-of-window set (last driver row r13) in registry
# order — 50 keys, so the window is the front verbatim and the
# out-of-window set is EXACTLY r14's 50-key window (all green in
# CORRECTNESS_r14); the r14∪r15 union covers the whole registry with
# no leftovers. No queries added or retired this round (optimization
# round).
#
# CAPACITY: registry = 100 — still at the two-round ceiling. Round 16
# MUST front exactly the 50 queries outside this round's window,
# i.e. the ROUND-16 FRONT, precomputed (== this round's out-of-window
# set == the round-14 DRIVER_FRONT, in that order; any r16 retirement
# drops from here, any new query inserts at the head):
#   q9_product_type_profit, q12_shipmode_priority, lsh_self_pairs,
#   curate_join, pq_ann_topk, vox_changes_feed, vox_label_histogram,
#   vox_unique_bbox, simhash_hamming_k_pairs, dedup_cluster_size_stats,
#   doc_bigram_logprob, embedding_outliers, q7_nation_trade,
#   q14_promo_revenue, events_funnel, event_props_extract,
#   events_cohort_retention, events_top_paths, q4_order_priority,
#   q21_suppliers_waiting, q15_top_supplier, q17_small_qty_revenue,
#   q18_large_volume_customer, q19_discounted_revenue,
#   nations_customers_no_suppliers, customer_spend_deciles,
#   largest_order_per_customer, event_type_share, boilerplate_ngrams,
#   line_dedup, repeated_spans, mixture_sample, token_bucket_stats,
#   doc_perplexity, corpus_shuffle, corpus_curate,
#   corpus_sample_stratified, tfidf_top_terms, doc_context_windows,
#   doc_policy_scan, doc_pii_redact, dedup_keep_best,
#   corpus_pack_sequences, corpus_contamination, corpus_snapshot_diff,
#   mm_image_features, mm_image_resize, mm_video_frame_sample,
#   mm_audio_features, mm_asset_stats
ALL_MODULES = [
    voxel_rel, dedup, text, similarity, relational, curation, corpus,
    multimodal,
]

DRIVER_FRONT = [
    # r14-rewritten TPC-H forms — first driver row on the new code
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_potential_promotion",
    "q22_global_sales_opportunity",
    "q16_parts_supplier_relationship",
    # serving/index paths: last driver row r13
    "lsh_index_lookup",
    "ivf_ann_topk_int8",
    "embedding_curate",
    # voxel: last driver row r13
    "vox_label_envelope",
    "vox_point_lookup",
    "vox_remap",
    "vox_exists",
    "vox_downsample",
    "graphene_label_decode",
    # dedup (minhash family rewritten r14): last driver row r13
    "dedup_incremental",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "fuzzy_neardup_titles",
    "dedup_rate_by_source",
    # text/doc: last driver row r13
    "doc_token_stats",
    "doc_subword_count",
    "doc_quality_score",
    "doc_fingerprint",
    "doc_langid",
    "doc_repetition",
    "doc_quality_filter",
    "source_mixture_stats",
    "bigram_lm_top",
    # similarity (ivf/embedding family rewritten r14)
    "embedding_quantize_int8",
    "ann_topk_cosine",
    "embedding_neardup_pairs",
    "embedding_dedup_keep",
    "semantic_dedup",
    "srp_ann_topk",
    "ivf_ann_topk",
    "embedding_kmeans",
    "embedding_dim_stats",
    # relational/events: last driver row r13
    "q10_returned_items",
    "events_conversion_lag",
    "q8_market_share",
    "q13_customer_distribution",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_forecast",
    "top_customers_per_nation",
    "rollup_revenue",
    "events_running_total",
    "events_sessionize",
    "events_asof_latest_order",
]


def all_queries():
    merged = {}
    for m in ALL_MODULES:
        merged.update(m.QUERIES)
    unknown = [k for k in DRIVER_FRONT if k not in merged]
    if unknown:
        # loud, named error instead of a bare KeyError mid-dict-comp
        # (round-12 advice): a typo during rotation must say which
        # key is wrong, not brick every import-time consumer opaquely
        raise ValueError(
            f"DRIVER_FRONT names unregistered queries: {unknown}")
    out = {k: merged[k] for k in DRIVER_FRONT}
    out.update(merged)  # existing keys keep position; rest append
    return out


def all_oracle_sql():
    merged = {}
    for m in ALL_MODULES:
        merged.update(m.ORACLE_SQL)
    out = {k: merged[k] for k in DRIVER_FRONT if k in merged}
    out.update(merged)
    return out


def retired_queries():
    """Queries retired from the driver registry to free 50-query
    window slots — still exercised by the local DuckDB parity suite
    (tests/test_oracle_parity.py) every run; each is subsumed by a
    registered superset query (see the module-level RETIRED dicts)."""
    merged = {}
    for m in ALL_MODULES:
        merged.update(getattr(m, "RETIRED_QUERIES", {}))
    return merged


def retired_oracle_sql():
    merged = {}
    for m in ALL_MODULES:
        merged.update(getattr(m, "RETIRED_ORACLE_SQL", {}))
    return merged
