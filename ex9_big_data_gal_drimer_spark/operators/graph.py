"""Iterative graph operators: connected components via label
propagation (the dedup-grouping primitive).

Greedy pair-dropping (dedup_apply_ngram) under-merges transitive
near-dup chains (A~B, B~C but A!~C).  Proper dedup groups duplicates
into CONNECTED COMPONENTS of the pair graph and keeps one doc per
component.  Spark has no built-in CC; this is the standard iterative
min-label propagation:

  label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint.  Each iteration is one join + one aggregate
(all distributed); the driver loop only checks the converged flag —
iteration count is bounded by the component diameter (near-dup
components are tiny), with a hard max_iter backstop.  At 100 TB
use large-star/small-star contraction to cut the iteration count on
long chains; the per-iteration plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min
    node id reachable in the undirected pair graph."""
    # cache the symmetric edge set: every iteration joins against it,
    # and without the cache each iteration re-derives the (possibly
    # expensive) upstream pair pipeline.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("neighbor_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
                (F.col("neighbor_component") < F.col("component")).alias("__changed"),
            )
        )
        # one action per iteration: converged?  cache the new labels so
        # the check and the next iteration share the computation.
        new_labels = new_labels.cache()
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels.unpersist() if hasattr(labels, "is_cached") and labels.is_cached else None
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels
