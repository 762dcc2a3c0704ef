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
    # ROUND-4 WINDOW.  Policy (round-3 verdict asks #3): ONLY
    # oracle-bearing queries are seated — the driver banks nothing for
    # rows-only entries (err='no_oracle', null row counts; their
    # pinning is the local pytest suite).  27 dark oracle-bearing
    # queries from rounds 2–3 + 23 new round-4 queries = exactly 50.
    # ------------------------------------------------------------------
    # the one oracle-bearing query that ever errored at the driver
    # (round-3 array canon crash) — now returns an atomic STRING
    "array_agg_segments",
    # 26 oracle-bearing queries never driver-checked (all hash-green in
    # CORRECTNESS_LOCAL_r03; round-3 verdict ROUND-4 ROTATION list)
    "cdc_merge_customers",
    "scd2_priority_history",
    "profile_orders_columns",
    "part_cooccurrence_top20",
    "histogram_order_totals",
    "incremental_agg_maintenance",
    "pagerank_part_cooccurrence",
    "events_click_nonconverting",
    "robust_price_stats_by_priority",
    "sorted_layout_rowgroup_skip",
    "zorder_layout_skip",
    "doc_bigram_logprob",
    "dedup_keep_best_doc",
    "training_mix_by_lang",
    "snapshot_diff_customers",
    "recursive_month_series",
    "sql_udf_doc_score",
    "price_size_regression",
    "ngram_duplication_audit",
    "triangle_census_cooccurrence",
    "chi2_status_priority",
    "dq_contract_orders",
    "group_aware_split",
    "phrase_search_positional",
    "ewma_user_value",
    "bitmap_distinct_rollup",
    # round-4 TPC-H-shaped suite (queries_tpch.py), oracle-checked
    "tpch_q4_late_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q12_late_lines_priority",
    "tpch_q14_promo_effect",
    "tpch_q18_large_volume_customers",
    "tpch_q19_discount_revenue",
    "tpch_q21_last_shippers",
    "tpch_q22_dormant_customers",
    # round-4 analytics/curation additions (queries_analytics4.py),
    # oracle-checked from day one (round-3 verdict ask #6)
    "sessionize_events_gap",
    "event_retention_cohorts",
    "events_anomaly_zscore",
    "orders_running_share_pareto",
    "orders_yoy_growth_by_nation",
    "customer_balance_deciles",
    "doc_zipf_slope",
    "doc_type_token_ratio",
    "token_length_buckets",
    "embedding_norm_outliers",
    "late_event_lateness_audit",
    "user_rfm_segmentation",
]
# 50 priority entries fill the driver's 50-slot window exactly.  Every
# other query rides on banked green rows (CORRECTNESS_r01–r03) plus
# the local differential suite, which covers all queries regardless of
# position.  After CORRECTNESS_r04 banks this window, the union of
# r01–r04 driver rows covers 130 of the registry's oracle-bearing
# queries (107 pre-r4 + 23 seated here); every oracle-bearing query
# added after the window was committed (21 as of end of round 4 — the
# registry now carries 151 oracles) is named in the ROUND-5 ROTATION
# note below and is hash-green in CORRECTNESS_LOCAL_r04.
#
# ROUND-5 ROTATION: after CORRECTNESS_r04 banks the window above, the
# oracle-bearing queries lacking a driver row are exactly the ones
# added after the 50 slots were committed (all hash-green in
# CORRECTNESS_LOCAL_r04/r05): merge_sink_upsert_totals,
# tpch_q21_bucketed, the TPC-H completion set (queries_tpch2.py:
# tpch_q2_min_cost_supplier, tpch_q9_product_type_profit,
# tpch_q11_important_stock, tpch_q13_customer_distribution,
# tpch_q15_top_supplier, tpch_q16_parts_supplier_relationship,
# tpch_q17_small_quantity_revenue, tpch_q20_part_promotion, and the
# canonical tpch_q1_pricing_summary / tpch_q3_shipping_priority /
# tpch_q5_local_supplier_volume), the
# curation-governance set (queries_curation3.py: domain_quality_cap,
# source_vocab_overlap, source_unigram_divergence,
# embedding_label_cohesion, char_window_duplication,
# adaptive_quality_threshold), the embedding-training pair
# (queries_embeddings2.py: hard_negative_mining,
# embedding_quantization_error), schema_evolution_scan
# (queries_layout.py), join_key_skew_audit (queries_scale_audit.py),
# layout_file_audit (queries_layout.py), event_transition_matrix
# (queries_analytics4.py), and any later round-4.5 additions —
# seat ALL of them first next round, then re-verify the oldest banked
# rows (r01 vintage) on a rolling basis.


def _reorder_for_driver() -> None:
    ordered = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    for n, fn in QUERIES.items():
        if n not in ordered:
            ordered[n] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)


_reorder_for_driver()
