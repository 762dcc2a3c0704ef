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
from . import queries_platform4  # noqa: F401,E402
from . import queries_analytics6  # noqa: F401,E402

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
    # ROUND-10 WINDOW.  Policy unchanged (round-3 verdict ask #3): ONLY
    # oracle-bearing queries are seated; rows-only tiers are never
    # seated (the driver banks nothing for them).
    # (a) changed-plan re-verify (1): the round-9 staged top-k rewrite
    #     of levenshtein_similar_parts (tier-0 equi-join + 51-key group
    #     trim) — its banked r05 row verified the OLD exhaustive plan;
    #     oracle-green locally at sf0.001/0.01/0.1, MUST bank the new
    #     plan first (round-9 verdict ask #1).
    # (b) round-10 additions (3, inside the <=3 new-oracle budget —
    #     round-9 verdict ask #4): weighted-quantile generalization of
    #     the two-phase bucketed median, incremental CC maintenance
    #     (graph twin of incremental_agg_maintenance, oracle = full
    #     recompute), and the clamped-accumulator fold (non-associative
    #     per-key scan, F.aggregate == DuckDB list_reduce).
    # (c) rolling re-verification: ALL 46 r05-vintage rows (age 5 at
    #     the r10 bank; tools/preflight.py --check-vintage enforces).
    #     Alphabetical (all same vintage).
    "levenshtein_similar_parts",
    "weighted_quantiles_price",
    "incremental_cc_maintenance",
    "capped_running_balance",
    "adaptive_quality_threshold",
    "benford_first_digit_audit",
    "char_window_duplication",
    "daily_revenue_gapfill_interp",
    "daily_revenue_moving_median",
    "domain_quality_cap",
    "embedding_label_cohesion",
    "embedding_quantization_error",
    "event_transition_matrix",
    "gini_revenue_by_nation",
    "grouping_sets_sql",
    "hard_negative_mining",
    "hash_bucket_balance_audit",
    "join_key_skew_audit",
    "knn_ivf_oracle_fixed_centroids",
    "lang_entropy_by_source",
    "layout_file_audit",
    "merge_sink_upsert_totals",
    "minhash_estimate_quality_md5",
    "minhash_lsh_oracle_md5",
    "numeric_corr_matrix_lineitem",
    "orders_date_parts",
    "q1_nation_order_stats",
    "q2_urgent_orders_by_nation",
    "q3_order_status_breakdown",
    "q4_nation_rank",
    "schema_evolution_scan",
    "simhash_hamming_oracle_md5",
    "source_unigram_divergence",
    "source_vocab_overlap",
    "time_weighted_avg_value",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q17_small_quantity_revenue",
    "tpch_q1_pricing_summary",
    "tpch_q20_part_promotion",
    "tpch_q21_bucketed",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit",
    "union_high_value_customers",
    "user_active_day_streaks",
    "welch_ttest_purchase_view",
]
# 50 priority entries fill the driver's 50-slot window exactly
# (checked below).  Every other query rides on banked green rows
# (CORRECTNESS_r01-r09) plus the local differential suite, which
# covers all queries regardless of position.  Bookkeeping at the
# round-10 window freeze: registry 227 queries / 198 oracles (the 3
# round-10 additions are all seated; +3 late-round-10 rows-only
# staged-oracle queries in queries_analytics6.py → 230 total), 195
# banked green + 3 new;
# vintages after CORRECTNESS_r09: 46×r05, 49×r06 (incl.
# levenshtein_similar_parts), 50×r08, 50×r09.  After CORRECTNESS_r10
# banks this window, no row is older than r06 (age 4 — the oldest
# the rotation plan allows) and cohorts are 48×r06, 50×r08, 50×r09,
# 50×r10.
#
# ROUND-11 ROTATION (precomputed): prepend any round-11 additions or
# changed-plan re-verifies (≤2 at this backlog), then the 48
# r06-vintage rows (age 5 at the r11 bank — all MUST be seated;
# the r06 bank minus levenshtein_similar_parts and
# quantity_weighted_median_price, which re-banked in r10/r09).
# 48 + 2 new fits the 50-slot window exactly;
# tools/preflight.py --check-vintage enforces the residue rule.
# The 2 new-oracle seats are PRE-BUILT (queries_analytics6.py, late
# round 10): all three candidate families are implemented, registered
# rows-only, and their oracle SQL is STAGED (registry.STAGED_ORACLES,
# differentially verified by tests/test_staged_oracles.py at every
# pytest run).  Round-11 promotion is a one-word edit per query
# (``staged_oracle=`` → ``oracle=``) plus seating:
#   (a) skyline_parts_pareto — sort-based per-brand Pareto front vs
#       the NOT-EXISTS dominance anti-join oracle → SEAT 1.
#   (b) peak_concurrent_sessions — distributed two-phase sweep line
#       vs DuckDB's global-window sweep → SEAT 2.
#   (c) join_delta_view_maintenance — upsert-merge of a restated
#       delta into a persisted join materialization vs full
#       recompute — stays STAGED indefinitely: the steady-state
#       oracle capacity is 50 slots x 4-round horizon = 200 rows and
#       seats (a)+(b) fill it (198 + 2); its IVM family is already
#       oracle-banked twice (incremental_agg/cc_maintenance).
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
