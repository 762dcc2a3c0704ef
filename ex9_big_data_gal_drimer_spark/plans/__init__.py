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
    # round-3 additions, never driver-checked (hotels fixture per
    # round-2 verdict ask #5)
    "hotels_q1",
    "hotels_q2",
    "hotels_q3",
    "hotels_q4",
    "hotels_q5",
    "hotels_q6",
    # round-2 queries dark to the driver (VERDICT.md round 2, ask #1)
    "asof_latest_purchase",
    "range_join_price_bands",
    "dedup_connected_components",
    "rolling_revenue_frames",
    "customer_order_gaps",
    "monthly_revenue_momentum",
    "tfidf_top_terms",
    "bm25_rank_docs",
    "chunk_documents",
    "curate_training_corpus",
    "from_json_typed",
    "variant_json_events",
    "array_agg_segments",
    "lineitem_price_stats",
    "events_rollup_cascade",
    "events_enriched_by_nation",
    "resample_user_hourly",
    "bpe_token_stats",
    "doc_quality_scores",
    "dedup_embedding_cosine",
    "hll_sketch_rollup",
    "word_topk_sketch_rollup",
    "knn_lsh_cosine",
    "knn_sq_cosine",
    "knn_ivf_cosine",
    # round-3: Arrow-vectorized exact top-k, hash-checkable (ask #7)
    "knn_vectorized_cosine",
    # round-3: sketch merge through persisted table state (ask #8)
    "sketch_store_rollup",
    # round-3: real BMP/PPM pixel decode over synthesized payloads (ask #6)
    "media_features_real",
    # round-3: training-pipeline ops (split/pack/leakage), oracle-checked
    "dataset_split_assign",
    "pack_sequences",
    "split_leakage_check",
    # round-3: 0-exchange bucketed join, oracle-checked through real
    # bucketed tables
    "bucketed_join_segment_revenue",
    # round-3: ANN recall-vs-exact monitoring row (rows-only)
    "ann_recall_report",
    # round-3: curation guardrails (PII scrub, repetition gate,
    # train/eval decontamination), all oracle-checked
    "pii_redaction_audit",
    "doc_repetition_quality",
    "decontaminate_against_eval",
    # round-3: SemDeDup k-means semantic dedup (rows-only; iterative)
    "semdedup_embeddings",
    # round-3: IVF ANN over kmeans-trained centroids (rows-only)
    "knn_ivf_trained",
    # round-3: date-partitioned layout, pruning-checked vs full scan
    "partitioned_scan_pruning",
    # round-3: ordered three-step conversion funnel, oracle-checked
    "funnel_view_click_purchase",
    # round-3 late additions, never driver-checked in any round:
    # OHLC gauge rollup (oracle), approx-percentile scale variant,
    # persisted k-means model store, PNG chunk-walk UDTF
    "events_ohlc_hourly",
    "quantiles_approx_scale_variant",
    "knn_ivf_model_store",
    "media_png_chunk_audit",
]
# 50 priority entries fill the driver's 50-slot window exactly; the
# flagship q1–q6 (and everything later) ride on their banked green
# rows from CORRECTNESS_r01/r02 plus the local differential suite,
# which covers all queries regardless of position.
#
# ROUND-4 ROTATION: once CORRECTNESS_r03 banks the list above,
# re-seat these 29 late-round-3 queries (never driver-checked; all
# local-green, and every oracle-bearing one is hash-green in the
# committed CORRECTNESS_LOCAL_r03.json full-registry sweep) at the
# head of the next window:
#   cdc_merge_customers, scd2_priority_history, profile_orders_columns,
#   part_cooccurrence_top20, histogram_order_totals,
#   incremental_agg_maintenance, pagerank_part_cooccurrence,
#   events_click_nonconverting, robust_price_stats_by_priority,
#   sorted_layout_rowgroup_skip, zorder_layout_skip,
#   doc_bigram_logprob, dedup_keep_best_doc,
#   knn_pq_adc, knn_ivfpq_cosine, training_mix_by_lang,
#   snapshot_diff_customers, media_payload_stats_arrow,
#   recursive_month_series, sql_udf_doc_score, price_size_regression,
#   ngram_duplication_audit, triangle_census_cooccurrence,
#   chi2_status_priority, dq_contract_orders, group_aware_split,
#   phrase_search_positional, ewma_user_value, bitmap_distinct_rollup,
#   plus anything else added late in round 3 (see git log)


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
