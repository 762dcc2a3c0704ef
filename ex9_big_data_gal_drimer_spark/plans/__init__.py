"""Query plan registry — import side-effect registers all queries."""

from .registry import ORACLES, QUERIES, register  # noqa: F401

from . import queries_parity  # noqa: F401,E402
from . import queries_relational  # noqa: F401,E402
from . import queries_relational2  # noqa: F401,E402
from . import queries_relational3  # noqa: F401,E402
from . import queries_events  # noqa: F401,E402
from . import queries_llm  # noqa: F401,E402
from . import queries_llm_scale  # noqa: F401,E402
from . import queries_text2  # noqa: F401,E402
from . import queries_llm2  # noqa: F401,E402
from . import queries_asof  # noqa: F401,E402
from . import queries_range_rollup  # noqa: F401,E402
from . import queries_graph  # noqa: F401,E402
from . import queries_functions  # noqa: F401,E402
from . import queries_stats  # noqa: F401,E402
from . import queries_text3  # noqa: F401,E402
from . import queries_analytic  # noqa: F401,E402
from . import queries_curation  # noqa: F401,E402
from . import queries_curation2  # noqa: F401,E402
from . import queries_curation3  # noqa: F401,E402
from . import queries_embeddings2  # noqa: F401,E402
from . import queries_scale_audit  # noqa: F401,E402
from . import queries_semdedup  # noqa: F401,E402
from . import queries_layout  # noqa: F401,E402
from . import queries_hotels  # noqa: F401,E402
from . import queries_media  # noqa: F401,E402
from . import queries_training  # noqa: F401,E402
from . import queries_bucketed  # noqa: F401,E402
from . import queries_warehouse  # noqa: F401,E402
from . import queries_incremental  # noqa: F401,E402
from . import queries_lm  # noqa: F401,E402
from . import queries_spark4  # noqa: F401,E402
from . import queries_tpch  # noqa: F401,E402
from . import queries_tpch2  # noqa: F401,E402
from . import queries_analytics4  # noqa: F401,E402
from . import queries_streaming_state  # noqa: F401,E402
from . import queries_dedup_oracle  # noqa: F401,E402
from . import queries_ann_oracle  # noqa: F401,E402
from . import queries_analytics5  # noqa: F401,E402
from . import queries_platform2  # noqa: F401,E402
from . import queries_platform  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver evaluation window: the correctness harness checks only the FIRST 50
# registered queries.  Registration order is import order above, which tracks
# build history — so without intervention every newly added query lands PAST
# the window and never earns a driver correctness row (round-2 verdict §1).
#
# Fix: an explicit priority list.  Queries that have never had a driver row
# (round-2 additions + anything new this round) are re-seated FIRST; queries
# whose green rows are already banked in CORRECTNESS_r01/r02 follow in their
# original registration order.  Local tests cover every query regardless of
# position, so this only changes which rows the driver re-verifies.
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY: list[str] = [
    # ------------------------------------------------------------------
    # ROUND-7 ROTATION (queries added AFTER the round-6 window below
    # was frozen — seat these FIRST next round, then continue the
    # rolling re-verification with the remaining r03-vintage rows):
    #   zorder_layout_audit, snapshot_diff_cdc, event_sequence_cohorts,
    #   listagg_top_parts_by_brand, multiformat_roundtrip_audit
    #   (queries_platform.py, 5 oracles);
    #   k_anonymity_audit, bloom_filter_fp_audit,
    #   daily_revenue_autocorr, markov_next_event_entropy
    #   (queries_platform2.py, 4 oracles);
    #   edit_distance_verify_lsh (queries_dedup_oracle.py — the
    #   registered scale path for the levenshtein verify tier)
    # Changed-plan re-verifies also due: basket_lift_top_pairs,
    # part_cooccurrence_top20 (shuffle-halving rewrites, oracle-green
    # locally at sf0.01 this round).  audio_features_real /
    # video_frames_real are rows-only — never seated per policy.
    # ------------------------------------------------------------------
    # ROUND-6 WINDOW.  Policy unchanged (round-3 verdict ask #3): ONLY
    # oracle-bearing queries are seated.  As of round 5 every oracle-
    # bearing query has a banked hash-green row (173/173, VERDICT r5),
    # so this window = (a) queries whose oracle is NEW or whose
    # semantics CHANGED this round, then (b) the oldest-vintage banked
    # rows on the rolling re-verification basis — all 37 r02-vintage
    # rows plus the 8 alphabetically-first r03-vintage rows.
    # ------------------------------------------------------------------
    # (a) new this round (round-5 verdict ask #5: oracle-checkable
    # md5-order sampling twins) + changed this round (ask #3/#4
    # re-grained plans; user_path_top10 NULL-handling parity fix)
    "sample_md5_topn_orders",
    "sample_md5_stratified_orders",
    "acctbal_percentile_profile",
    "quantity_weighted_median_price",
    "user_path_top10",
    # (b) rolling re-verification: the full r02 vintage (37)
    "case_map_event_severity",
    "cube_status_priority",
    "customers_with_orders_semi",
    "customers_without_orders_anti",
    "dedup_apply_ngram",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_ngram_prefix",
    "doc_fingerprint_stats",
    "embedding_stats_by_label",
    "event_type_rates",
    "events_click_purchase_join",
    "events_session_10m",
    "events_sliding_1h_30m",
    "events_tumbling_1h",
    "json_extract_events",
    "knn_bruteforce_cosine",
    "lang_distribution",
    "latest_event_per_user",
    "levenshtein_similar_parts",
    "multiset_ops_lineitem",
    "nation_orders_others_bucket",
    "order_price_quantiles",
    "orders_by_month",
    "pivot_status_by_priority",
    "pricing_summary",
    "q5_part_token_stats",
    "q6_customer_concentration",
    "regional_revenue",
    "revenue_top_orders",
    "rollup_region_nation",
    "set_ops_customers",
    "skew_salted_revenue",
    "text_quality_by_source",
    "top_orders_per_nation",
    "unpivot_priority_counts",
    "word_freq_top20",
    # (b) continued: oldest r03-vintage rows (8 of 36)
    "asof_latest_purchase",
    "bm25_rank_docs",
    "bpe_token_stats",
    "bucketed_join_segment_revenue",
    "chunk_documents",
    "curate_training_corpus",
    "customer_order_gaps",
    "dataset_split_assign",
]
# 50 priority entries fill the driver's 50-slot window exactly
# (asserted below).  Every other query rides on banked green rows
# (CORRECTNESS_r01-r05) plus the local differential suite, which
# covers all queries regardless of position.  Bookkeeping at the
# round-6 window freeze: registry 199 queries / 175 oracles (211/185
# by end of round 6 — see the ROUND-7 ROTATION note); the union of
# r01-r05 banks covers all 173 pre-round-6 oracles (vintages after
# CORRECTNESS_r05: 37×r02, 36×r03, 50×r04, 50×r05); the 2 new + 3
# changed entries seated first are the only rows without a current
# bank.  After CORRECTNESS_r06 banks this window, no oracle row is
# older than r03.
#
# ROUND-7 ROTATION — the 50-name window is precomputed below from the
# r01–r06 banks (vintages at round-6 close: 37×r02 re-banking via
# CORRECTNESS_r06, 36→28 r03, 50 r04, 50 r05).  At round-7 start:
# prepend any oracle query added/changed in round 7 itself, trim the
# same number of names off the r04 tail, and replace _DRIVER_PRIORITY
# with the result.
#   (a) never-banked round-6 tail (10):
#     zorder_layout_audit, snapshot_diff_cdc, event_sequence_cohorts,
#     listagg_top_parts_by_brand, multiformat_roundtrip_audit,
#     k_anonymity_audit, bloom_filter_fp_audit, daily_revenue_autocorr,
#     markov_next_event_entropy, edit_distance_verify_lsh
#   (b) changed-plan re-verifies (2):
#     basket_lift_top_pairs, part_cooccurrence_top20
#   (c) r03-vintage remaining (28):
#     decontaminate_against_eval, dedup_connected_components,
#     dedup_embedding_cosine, doc_quality_scores,
#     doc_repetition_quality, events_enriched_by_nation,
#     events_ohlc_hourly, events_rollup_cascade, from_json_typed,
#     funnel_view_click_purchase, hotels_q1, hotels_q2, hotels_q3,
#     hotels_q4, hotels_q5, hotels_q6, knn_vectorized_cosine,
#     lineitem_price_stats, monthly_revenue_momentum, pack_sequences,
#     partitioned_scan_pruning, pii_redaction_audit,
#     range_join_price_bands, resample_user_hourly,
#     rolling_revenue_frames, split_leakage_check, tfidf_top_terms,
#     variant_json_events
#   (d) oldest r04-vintage, alphabetical (10):
#     array_agg_segments, bitmap_distinct_rollup, cdc_merge_customers,
#     chi2_status_priority, customer_balance_deciles,
#     dedup_keep_best_doc, doc_bigram_logprob, doc_type_token_ratio,
#     doc_zipf_slope, dq_contract_orders


def _reorder_for_driver() -> None:
    # Round-5 ADVICE: a typo in the hand-maintained list must fail loudly,
    # not silently shift the exactly-50 driver window.
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"_DRIVER_PRIORITY names absent from QUERIES: {missing}"
    assert len(_DRIVER_PRIORITY) == 50, (
        f"_DRIVER_PRIORITY must fill the 50-slot window exactly, "
        f"got {len(_DRIVER_PRIORITY)}"
    )
    assert len(set(_DRIVER_PRIORITY)) == 50, "_DRIVER_PRIORITY has duplicates"
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY}
    for n, fn in QUERIES.items():
        if n not in ordered:
            ordered[n] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)


_reorder_for_driver()
