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
    # ROUND-7 WINDOW.  Policy unchanged (round-3 verdict ask #3): ONLY
    # oracle-bearing queries are seated; rows-only tiers are never
    # seated (the driver banks nothing for them).
    # (0) NEW this round (queries_platform3.py, 10 oracles) — per the
    #     growth-discipline cap, exactly the 10 slots freed by trimming
    #     the r04 tail (those rows stay age-3 in the r04 bank, inside
    #     the 4-round vintage horizon).
    "l_diversity_audit",
    "dp_clipping_audit",
    "table_stats_profile",
    "join_cardinality_audit",
    "dow_seasonality_index",
    "event_interarrival_profile",
    "ivf_cell_balance_audit",
    "sq_quantization_error_audit",
    "corpus_novelty_curve",
    "cross_source_fingerprint_overlap",
    # (a) never-banked round-6 tail (10): green in CORRECTNESS_LOCAL_r06
    #     but added after the round-6 window froze — seating them here
    #     converts the last local-only oracles into banked driver rows
    #     (round-6 verdict ask #1).
    "zorder_layout_audit",
    "snapshot_diff_cdc",
    "event_sequence_cohorts",
    "listagg_top_parts_by_brand",
    "multiformat_roundtrip_audit",
    "k_anonymity_audit",
    "bloom_filter_fp_audit",
    "daily_revenue_autocorr",
    "markov_next_event_entropy",
    "edit_distance_verify_lsh",
    # (b) changed-plan re-verifies (2): round-6 shuffle-halving
    #     rewrites, oracle-green locally — bank the NEW plans.
    "basket_lift_top_pairs",
    "part_cooccurrence_top20",
    # (c) rolling re-verification: the remaining r03-vintage rows (28)
    "decontaminate_against_eval",
    "dedup_connected_components",
    "dedup_embedding_cosine",
    "doc_quality_scores",
    "doc_repetition_quality",
    "events_enriched_by_nation",
    "events_ohlc_hourly",
    "events_rollup_cascade",
    "from_json_typed",
    "funnel_view_click_purchase",
    "hotels_q1",
    "hotels_q2",
    "hotels_q3",
    "hotels_q4",
    "hotels_q5",
    "hotels_q6",
    "knn_vectorized_cosine",
    "lineitem_price_stats",
    "monthly_revenue_momentum",
    "pack_sequences",
    "partitioned_scan_pruning",
    "pii_redaction_audit",
    "range_join_price_bands",
    "resample_user_hourly",
    "rolling_revenue_frames",
    "split_leakage_check",
    "tfidf_top_terms",
    "variant_json_events",
    # (d) r04-vintage re-verification resumes in round 8 (trimmed to
    #     make room for the round-7 additions; all r04 rows remain
    #     inside the 4-round vintage horizon until round 9).
]
# 50 priority entries fill the driver's 50-slot window exactly
# (checked below).  Every other query rides on banked green rows
# (CORRECTNESS_r01-r06) plus the local differential suite, which
# covers all queries regardless of position.  Bookkeeping at the
# round-7 window freeze: registry 221 queries / 195 oracles; the
# union of r01-r06 banks covers 175 of the 195 (vintages after
# CORRECTNESS_r06: 28×r03, 50×r04, 50×r05, 47×r06); the 20 unbanked
# are exactly sections (0) and (a) of this window — the 10 new
# round-7 queries and the 10 round-6 post-close tail.  After
# CORRECTNESS_r07 banks this window, all 195 oracle queries are
# driver-proven and no banked row is older than r04.
#
# ROUND-8 ROTATION (precomputed): prepend any round-8 additions or
# changed-plan re-verifies, then the 50 r04-vintage rows (oldest
# first, alphabetical) — at the ~10-new cap that seats 40 of them;
# the residue reaches age 5 in round 9 and MUST be seated there
# (tools/preflight.py --check-vintage enforces exactly this).
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
