"""Query registry — the driver-facing contract surface.

Each implemented operator/query from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with the
ANSI-SQL oracle text DuckDB runs on the same parquet tables.  The
driver compares row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically in both forms;
- every float column is ROUND()ed identically in both forms;
- DuckDB integer SUMs are CAST to BIGINT (DuckDB promotes to HUGEINT,
  Spark keeps LongType).
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Oracles WRITTEN and pytest-verified but NOT yet driver-registered.
#: The rolling 50-slot re-verification window caps the registry at
#: ~200 oracle rows (50 slots x 4-round horizon); when a round's
#: window is full of mandatory vintage re-verifies, new queries park
#: their oracle SQL here (tests/test_staged_oracles.py runs the same
#: differential as test_oracle_parity.py) and flip to ``oracle=`` the
#: round a seat opens — registration then needs no new engineering.
STAGED_ORACLES: dict[str, str] = {}

#: Queries that run Spark actions during plan CONSTRUCTION by
#: documented design (fixpoint loops, persisted-state writes,
#: model-sized collects).  Single source of truth for bench.py
#: (times construction too) and tests/test_plan_audit.py (exempt
#: from the lazy-construction pin).
ITERATIVE_CONSTRUCTION: set[str] = {
    "dedup_connected_components",
    "group_aware_split",
    "sketch_store_rollup",
    "knn_vectorized_cosine",
    "bucketed_join_segment_revenue",
    "semdedup_embeddings",
    "knn_ivf_trained",
    "knn_ivf_model_store",
    "partitioned_scan_pruning",
    "sorted_layout_rowgroup_skip",
    "knn_pq_adc",
    "knn_ivfpq_cosine",
    "zorder_layout_skip",
    "schema_evolution_scan",
    "layout_file_audit",
    "ann_recall_report",
    "state_operator_inventory",
    "merge_sink_upsert_totals",
    "tpch_q21_bucketed",
    "multiformat_roundtrip_audit",
    "levenshtein_similar_parts",  # tier-0 sufficiency count (round 9)
    "bpe_train_merges",  # one argmax-row collect per merge round (round 12)
    "bpe_apply_segment",  # trains the same merge table before applying it
    "llm_pipeline_e2e",  # trains BPE over the deduped corpus (round 13)
}


def register(
    name: str, oracle: str | None = None, staged_oracle: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its DuckDB oracle SQL) to the registry.

    ``staged_oracle`` holds a fully-written oracle for a query that
    cannot take a driver-window seat this round (window full of
    mandatory re-verifies); it is pytest-verified only.  Promoting it
    is a one-word edit: ``staged_oracle=`` → ``oracle=``.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        if oracle is not None and staged_oracle is not None:
            raise ValueError(f"{name}: oracle and staged_oracle are exclusive")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        if staged_oracle is not None:
            STAGED_ORACLES[name] = textwrap.dedent(staged_oracle).strip()
        return fn

    return deco
