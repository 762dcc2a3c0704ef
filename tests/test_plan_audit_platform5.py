"""Physical-plan pins for the round-11 interval/sampling tier
(plans/queries_platform5.py) — the scale claims each docstring makes,
asserted against the actual plan:

- the calendar-banded interval rollup runs on an EQUI key: exactly one
  hash exchange (plus the final presentation sort), explode before the
  partial aggregate so the combine is map-side;
- the pair-emitting overlap join is keyed on the order equi-key (hash
  join, never a cartesian — the inequality is a post-join condition);
- the weighted bottom-k sample gets Catalyst's two-phase rank-limit
  pushdown (Partial + Final WindowGroupLimit), so partitions pre-trim
  to their local bottom-20 per stratum before the shuffle.
"""

from __future__ import annotations

from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.audit import (
    count_exchanges,
    executed_plan,
    has_cartesian,
)

from conftest import SF_DIR


def test_banded_rollup_is_single_hash_exchange(spark):
    df = QUERIES["intransit_inventory_by_week"](spark, SF_DIR)
    plan = executed_plan(df)
    # one hash exchange for the week aggregate + the ORDER BY range
    # exchange — nothing else moves data
    assert count_exchanges(df) == 2, plan
    assert plan.count("hashpartitioning(week") == 1, plan
    assert "Generate explode" in plan, plan
    # map-side combine: the partial aggregate sits below the exchange
    assert "partial_count" in plan and "partial_sum" in plan, plan
    # no inequality join anywhere — banding turned the range join into
    # a groupBy
    assert "Join" not in plan, plan


def test_overlap_pair_join_is_equi_keyed(spark):
    df = QUERIES["overlapping_shipments_pairs"](spark, SF_DIR)
    plan = executed_plan(df)
    assert not has_cartesian(df), plan
    # the join is hash-keyed on l_orderkey (broadcast at test SF,
    # shuffled hash/sort-merge at scale — any of them is equi-keyed);
    # the interval inequalities ride as the join condition, not the key
    assert "HashJoin [l_orderkey" in plan or "SortMergeJoin [l_orderkey" in plan, plan


def test_weighted_sample_gets_rank_limit_pushdown(spark):
    df = QUERIES["weighted_sample_orders_md5"](spark, SF_DIR)
    plan = executed_plan(df)
    # Partial (pre-shuffle, per input partition) + Final (post-shuffle)
    assert plan.count("WindowGroupLimit") == 2, plan
    assert "Partial" in plan.split("WindowGroupLimit")[2], plan
