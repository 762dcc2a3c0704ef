"""Connected-components contraction: correctness vs a driver-side
union-find, O(log n) convergence on long chains, loud non-convergence.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.operators.graph import (
    ConvergenceError,
    connected_components,
    incremental_components,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: component = min reachable id
    return {x: find(x) for x in parent}


def _spark_cc(spark, edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_id_a LONG, doc_id_b LONG")
    rows = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in rows}


def test_planted_100_node_chain(spark):
    """The VERDICT-r1 stress case: a 100-node chain must converge
    without lineage blow-up — star contraction needs O(log n) rounds,
    where min-label propagation would need one round per hop."""
    ids = list(range(1000, 1100))
    random.Random(7).shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    got = _spark_cc(spark, edges)
    lo = min(ids)
    assert got == {i: lo for i in ids}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = rng.sample(range(10_000), 120)
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _spark_cc(spark, edges) == _union_find(edges)


def test_nonconvergence_raises(spark):
    """Exhausting max_iter must fail loudly (ADVICE r1): unconverged
    labels silently corrupt downstream dedup."""
    edges = [(1, 2), (2, 3), (3, 4)]
    with pytest.raises(ConvergenceError):
        _spark_cc(spark, edges, max_iter=1)


def _spark_incremental(spark, settled, delta) -> dict[int, int]:
    state = connected_components(
        spark.createDataFrame(settled, "doc_id_a LONG, doc_id_b LONG")
    )
    d = spark.createDataFrame(delta, "doc_id_a LONG, doc_id_b LONG")
    rows = incremental_components(state, d).collect()
    return {r["node"]: r["component"] for r in rows}


def test_incremental_components_merge_branches(spark):
    """Every merge branch on one planted graph: a delta edge MERGING
    two settled components (both relabel to the joint min), a NEW-node
    chain attaching to a settled component, a delta edge INSIDE one
    settled component (self-loop after contraction — labels
    unchanged), an untouched settled component, and a new-nodes-only
    component.  Expected labels = full recompute semantics (min
    reachable id)."""
    settled = [
        (10, 11), (11, 12),   # comp A (min 10)
        (20, 21),             # comp B (min 20)
        (30, 31),             # comp C (min 30) — untouched
        (40, 41),             # comp D (min 40)
    ]
    delta = [
        (12, 21),             # merges A and B -> min 10
        (50, 51), (51, 20),   # new-node chain attaching to B (-> 10)
        (40, 41),             # inside D: contracts to a self-loop
        (60, 61),             # new-nodes-only component (min 60)
    ]
    got = _spark_incremental(spark, settled, delta)
    assert got == {
        10: 10, 11: 10, 12: 10,
        20: 10, 21: 10, 50: 10, 51: 10,
        30: 30, 31: 30,
        40: 40, 41: 40,
        60: 60, 61: 60,
    }


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_incremental_components_matches_recompute(spark, seed):
    """Differential pin: incremental merge over a random settled/delta
    edge split ≡ union-find over the UNION — including when a new
    node's id is smaller than every settled member (the new node
    becomes the component representative)."""
    rng = random.Random(seed)
    settled_nodes = rng.sample(range(100, 1000), 60)
    new_nodes = rng.sample(range(0, 100), 10) + rng.sample(
        range(1000, 2000), 10
    )
    settled = [
        (rng.choice(settled_nodes), rng.choice(settled_nodes))
        for _ in range(50)
    ]
    settled = [(a, b) for a, b in settled if a != b]
    mixed = settled_nodes + new_nodes
    delta = [
        (rng.choice(mixed), rng.choice(new_nodes)) for _ in range(25)
    ] + [
        (rng.choice(settled_nodes), rng.choice(settled_nodes))
        for _ in range(10)
    ]
    delta = [(a, b) for a, b in delta if a != b]
    got = _spark_incremental(spark, settled, delta)
    want = _union_find(settled + delta)
    # the incremental output covers settled-edge nodes plus delta
    # endpoints — the same universe the recompute labels
    assert got == want


def _persistent_rdds(spark) -> dict[int, str]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.keySet().iterator()
    out = {}
    while it.hasNext():
        k = it.next()
        out[k] = jmap.get(k).toString()
    return out


def test_no_lingering_cached_intermediates(spark):
    """graph ops must not leave persisted frames behind (ADVICE r1:
    cache-leak accumulation across a long-lived session)."""
    before = set(_persistent_rdds(spark))
    _spark_cc(spark, [(1, 2), (2, 3), (10, 11)])
    after = _persistent_rdds(spark)
    # localCheckpoint RDDs (of the returned frame / truncation points)
    # persist until driver GC by design; assert no .cache() leaks
    leaked = {
        k: v
        for k, v in after.items()
        if k not in before and "localcheckpoint" not in v.lower()
    }
    assert not leaked, f"leaked cached RDDs: {leaked}"
