"""Iterative graph operators: connected components (the dedup-grouping
primitive).

Greedy pair-dropping (dedup_apply_ngram) under-merges transitive
near-dup chains (A~B, B~C but A!~C).  Proper dedup groups duplicates
into CONNECTED COMPONENTS of the pair graph and keeps one doc per
component.  Spark has no built-in CC; this implements the two-phase
**large-star / small-star contraction** (Kiveris et al., "Connected
Components in MapReduce and Beyond", 2014):

  large-star: every node's neighbors larger than itself re-point to
              the minimum of its closed neighborhood;
  small-star: every node and its smaller neighbors re-point to that
              minimum.

Each phase is one groupBy + one join (all distributed); the edge set
contracts toward a star per component in **O(log n) rounds** — a
100-node chain converges in ~5 rounds where plain min-label
propagation needs 100 (one round per hop of diameter).  The driver
loop only runs the convergence check; lineage is truncated with
localCheckpoint every few rounds so the plan cannot grow unboundedly,
and every cached intermediate is unpersisted before returning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when the contraction loop exhausts max_iter — the labels
    would be silently wrong, so failing loudly is the only safe exit."""


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (u, v) with u > v, no self-loops."""
    return (
        edges.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: neighbors v > u re-point to min(Γ(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Edges directed larger→smaller; u and its smaller neighbors all
    re-point to the minimum of the closed neighborhood."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = e.join(mins, "u").filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    selfs = mins.select(F.col("u"), F.col("m").alias("v"))
    return _canonical(nbrs.union(selfs).select("u", "v"))


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min
    node id reachable in the undirected pair graph.

    One large-star + small-star round per iteration; converged when
    the canonical edge set's (count, hash-sum) signature is stable.
    Raises :class:`ConvergenceError` if max_iter is exhausted —
    at O(log n) rounds the default 20 covers graphs far beyond any
    realistic corpus (2^20 diameter), so hitting it means the input
    is pathological, and silently returning unconverged labels would
    corrupt the dedup downstream.
    """
    e = _canonical(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=True)  # detach from the (possibly huge)
    #                                upstream pair pipeline: every round
    #                                re-reads edges, never the pipeline
    prev_sig = None
    converged = False
    for i in range(max_iter):
        # checkpoint EVERY round: each round references `e` three
        # times, so an un-truncated logical plan grows ~3× per round
        # and Catalyst re-optimization cost explodes exponentially
        # (observed: a 100-node chain hung in the optimizer by round
        # ~5).  Eager materialization keeps the plan O(1) deep and the
        # per-round work equal to one contraction pass.
        e_next = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # one action per round: (count, order-independent hash sum)
        sig_row = e_next.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a LONG sum of xxhash64 overflows
            # under ANSI mode on any non-trivial edge count
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            converged = True
            e = e_next
            break
        prev_sig = sig
        e = e_next
    if not converged:
        raise ConvergenceError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # at fixpoint the edge set IS the star assignment: u → component v;
    # add the component roots themselves
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("component"))
    ).distinct()
    # pin the result so callers are independent of `e`'s checkpoint
    return labels.localCheckpoint(eager=True)
