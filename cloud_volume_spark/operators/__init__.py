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
# the PREVIOUS round's CORRECTNESS_r*.json, so the two-round union
# covers the whole registry — is mechanically enforced by
# tests/test_registry_invariants.py against the latest committed
# correctness file. To rotate next round: put the queries whose last
# driver row is oldest (plus every NEW query) into DRIVER_FRONT, keep
# it at <= 50 entries, and let the module order pad the window.
#
# ROUND-12 ROTATION (executing the round-11 note): the 37 queries whose
# last driver row is r10 (the relational tail 14 + curation 8 +
# corpus 10 + multimodal 5) plus the TEN new round-12 queries
# (q4/q21/q15/q17/q18 → relational; simhash_hamming_k_pairs +
# dedup_cluster_size_stats → dedup; doc_bigram_logprob → text;
# embedding_outliers → similarity; q19 joined late) = 47 fronted; the
# window's remaining 3 slots fall to voxel_rel's first 3 queries (all green in
# r11 — refreshing them is harmless). Registry = 97; the 47
# out-of-window queries are all r11-green (enforced by the invariant
# test). ROUND-13 ROTATION: front those 47 (their last row will then
# be r11) plus any new queries. CAPACITY NOTE: a 50-query window
# refreshed in alternating halves covers at most 100 registered
# queries on a two-round cadence — at 97 the registry has room for
# THREE more; beyond that, retire a query (or accept a three-round
# union and teach the invariant test about it) before adding.
ALL_MODULES = [
    voxel_rel, dedup, text, similarity, relational, curation, corpus,
    multimodal,
]

DRIVER_FRONT = [
    # new in round 12 — first driver rows
    "q4_order_priority",
    "q21_suppliers_waiting",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "simhash_hamming_k_pairs",
    "dedup_cluster_size_stats",
    "doc_bigram_logprob",
    "embedding_outliers",
    # relational tail: last driver row r10
    "q7_nation_trade",
    "q14_promo_revenue",
    "customers_without_orders",
    "events_funnel",
    "event_props_extract",
    "events_cohort_retention",
    "events_top_paths",
    "orders_above_customer_avg",
    "urgent_orders_with_lineitems",
    "brand_type_pivot",
    "nations_customers_no_suppliers",
    "customer_spend_deciles",
    "largest_order_per_customer",
    "event_type_share",
    # curation: last driver row r10
    "boilerplate_ngrams",
    "line_dedup",
    "repeated_spans",
    "mixture_sample",
    "token_bucket_stats",
    "doc_entropy",
    "doc_perplexity",
    "corpus_shuffle",
    # corpus: last driver row r10
    "corpus_curate",
    "corpus_sample_stratified",
    "tfidf_top_terms",
    "doc_context_windows",
    "doc_policy_scan",
    "doc_pii_redact",
    "dedup_keep_best",
    "corpus_pack_sequences",
    "corpus_contamination",
    "corpus_snapshot_diff",
    # multimodal: last driver row r10
    "mm_image_features",
    "mm_image_resize",
    "mm_video_frame_sample",
    "mm_audio_features",
    "mm_asset_stats",
]


def all_queries():
    merged = {}
    for m in ALL_MODULES:
        merged.update(m.QUERIES)
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
