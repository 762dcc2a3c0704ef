"""Physical-plan pins for the round-12 frontier tier
(plans/queries_platform6.py) — the scale claims each docstring makes,
asserted against the actual plan:

- span removal moves data exactly twice (gram window + per-doc
  rebuild), never joins, never sorts the corpus;
- HTML extraction is map-side only up to the per-source aggregate —
  one chain of JVM expressions, no Python UDF, no join;
- BPE segmentation's apply side joins vocabulary to occurrences on
  the word equi-key (hash-keyed, no cartesian), and the corpus is
  scanned by column-pruned reads (text/source only).
"""

from __future__ import annotations

from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.audit import (
    count_exchanges,
    executed_plan,
    has_cartesian,
    scan_read_schemas,
)

from conftest import SF_DIR


def test_span_removal_two_exchanges_no_join(spark):
    df = QUERIES["dedup_remove_spans"](spark, SF_DIR)
    plan = executed_plan(df)
    # gram-window exchange + doc-id rebuild exchange + presentation
    # sort — nothing else moves data, and nothing joins
    assert count_exchanges(df) == 3, plan
    assert plan.count("hashpartitioning(gram") == 1, plan
    assert plan.count("hashpartitioning(doc_id") == 1, plan
    assert "Join" not in plan, plan
    assert not has_cartesian(df), plan


def test_html_extract_is_mapside_single_aggregate_exchange(spark):
    df = QUERIES["html_text_extract"](spark, SF_DIR)
    plan = executed_plan(df)
    # one hash exchange for the source rollup + the ORDER BY range
    # exchange; extraction itself is a pure column-expression chain
    assert count_exchanges(df) == 2, plan
    assert plan.count("hashpartitioning(source") == 1, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # map-side combine below the exchange
    assert "partial_count" in plan and "partial_sum" in plan, plan
    # column pruning: the documents scan reads only what the page
    # synthesis needs
    schemas = " ".join(scan_read_schemas(df))
    assert "text" in schemas and "embedding" not in schemas, schemas


def test_bpe_apply_join_is_word_equi_keyed(spark):
    df = QUERIES["bpe_apply_segment"](spark, SF_DIR)
    plan = executed_plan(df)
    assert not has_cartesian(df), plan
    # vocabulary joins occurrences on the word key (broadcast at test
    # SF, shuffled hash/sort-merge at scale — all equi-keyed)
    assert (
        "HashJoin [w" in plan or "SortMergeJoin [w" in plan
    ), plan
    # the segmentation rewrite is JVM replace chains, not Python
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
