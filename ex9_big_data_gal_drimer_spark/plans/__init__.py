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
from . import queries_platform3  # noqa: F401,E402

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
    # ROUND-9 WINDOW.  Policy unchanged (round-3 verdict ask #3): ONLY
    # oracle-bearing queries are seated; rows-only tiers are never
    # seated (the driver banks nothing for them).
    # (a) changed-plan re-verify (1): the round-9 two-phase bucketed
    #     rewrite of the weighted median (round-8 verdict ask #5) —
    #     oracle-green locally at sf0.01 and sf0.1; bank the NEW plan.
    "quantity_weighted_median_price",
    # (b) rolling re-verification: ALL 49 r04-vintage rows (round 8
    #     banked no new work, so the precomputed round-8 rotation was
    #     never applied and the whole r04 cohort reaches age 5 at the
    #     r09 bank — every one must be seated now, per the round-8
    #     verdict ask #1 and tools/preflight.py --check-vintage).
    #     Alphabetical (all same vintage).
    "array_agg_segments",
    "bitmap_distinct_rollup",
    "cdc_merge_customers",
    "chi2_status_priority",
    "customer_balance_deciles",
    "dedup_keep_best_doc",
    "doc_bigram_logprob",
    "doc_type_token_ratio",
    "doc_zipf_slope",
    "dq_contract_orders",
    "embedding_norm_outliers",
    "event_retention_cohorts",
    "events_anomaly_zscore",
    "events_click_nonconverting",
    "ewma_user_value",
    "group_aware_split",
    "histogram_order_totals",
    "incremental_agg_maintenance",
    "late_event_lateness_audit",
    "ngram_duplication_audit",
    "orders_running_share_pareto",
    "orders_yoy_growth_by_nation",
    "pagerank_part_cooccurrence",
    "phrase_search_positional",
    "price_size_regression",
    "profile_orders_columns",
    "recursive_month_series",
    "robust_price_stats_by_priority",
    "scd2_priority_history",
    "sessionize_events_gap",
    "snapshot_diff_customers",
    "sorted_layout_rowgroup_skip",
    "sql_udf_doc_score",
    "token_length_buckets",
    "tpch_q10_returned_items",
    "tpch_q12_late_lines_priority",
    "tpch_q14_promo_effect",
    "tpch_q18_large_volume_customers",
    "tpch_q19_discount_revenue",
    "tpch_q21_last_shippers",
    "tpch_q22_dormant_customers",
    "tpch_q4_late_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "training_mix_by_lang",
    "triangle_census_cooccurrence",
    "user_rfm_segmentation",
    "zorder_layout_skip",
]
# 50 priority entries fill the driver's 50-slot window exactly
# (checked below).  Every other query rides on banked green rows
# (CORRECTNESS_r01-r08) plus the local differential suite, which
# covers all queries regardless of position.  Bookkeeping at the
# round-9 window freeze: registry 223 queries / 195 oracles (the 2
# round-9 additions are rows-only media audits, never seated), all
# 195 banked green; vintages after CORRECTNESS_r08: 49×r04, 46×r05,
# 50×r06, 50×r08 (the r08 bank re-verified the round-7 window).
# After CORRECTNESS_r09 banks this window, no row is older than r05
# (age 4 — the oldest the rotation plan allows).
#
# ROUND-10 ROTATION (precomputed): prepend any round-10 additions or
# changed-plan re-verifies (≤4 at this backlog), then the 46
# r05-vintage rows (age 5 at the r10 bank — all MUST be seated;
# alphabetical: adaptive_quality_threshold …
# welch_ttest_purchase_view per the r05 bank).  46 + 4 new fits
# the 50-slot window exactly;
# tools/preflight.py --check-vintage enforces the residue rule.
# Changed-plan re-verify OWED one of those 4 slots (round-6
# precedent: land mid-round, seat next window):
# levenshtein_similar_parts — round-9 staged top-k rewrite (tier-0
# equi-join + 51-key group trim, exhaustive fallback below 50
# exact-dup pairs); oracle-green locally at sf0.001/0.01/0.1, 142 s
# -> 1.5 s at sf1 (warm bench; ~5 s cold).  MUST be seated first in round 10.
#
# Growth discipline (round-6 verdict ask #7): cap NET NEW oracle
# queries at ~10 per round so the rolling window re-verifies every
# banked row within ~4-5 rounds; tools/preflight.py --check-vintage
# gates on any oracle row STRICTLY older than 4 rounds (or missing
# entirely) that is not seated in the current window.


def _reorder_for_driver() -> None:
    # Round-5 ADVICE: a typo in the hand-maintained list must fail loudly,
    # not silently shift the exactly-50 driver window.  Round-6 ADVICE:
    # raise explicitly, never bare assert (stripped under `python -O`).
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(
            f"_DRIVER_PRIORITY names absent from QUERIES: {missing}"
        )
    if len(_DRIVER_PRIORITY) != 50:
        raise ValueError(
            f"_DRIVER_PRIORITY must fill the 50-slot window exactly, "
            f"got {len(_DRIVER_PRIORITY)}"
        )
    if len(set(_DRIVER_PRIORITY)) != 50:
        raise ValueError("_DRIVER_PRIORITY has duplicates")
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
