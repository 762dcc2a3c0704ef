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
}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its DuckDB oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco
