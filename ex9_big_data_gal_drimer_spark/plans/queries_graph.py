"""Connected-components dedup grouping (recursive-CTE oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import query_persist, table
from ..operators.dedup import ngram_jaccard_pairs
from ..operators.graph import connected_components
from .registry import register


#: Shared recursive-CTE oracle prelude: the near-dup pair graph and
#: its transitive closure (used by dedup_connected_components and the
#: group-aware split in queries_training).
CC_ORACLE_CTES = """
    WITH RECURSIVE toks AS (
        SELECT doc_id, lang, n_chars // 50 AS len_bucket,
               string_split(LOWER(text), ' ') AS t
        FROM documents
    ), shingled AS (
        SELECT doc_id, lang, len_bucket,
               CASE WHEN len(t) >= 3
                    THEN list_distinct([list_aggr(t[i:i+2], 'string_agg', ' ')
                                        for i in range(1, len(t) - 1)])
                    ELSE [list_aggr(t, 'string_agg', ' ')]
               END AS sh
        FROM toks
    ), pairs AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM shingled a
        JOIN shingled b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket
             AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.5
    ), sym AS (
        SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
    ), reach AS (
        SELECT a AS node, b AS reachable FROM sym
        UNION
        SELECT r.node, s.b FROM reach r JOIN sym s ON r.reachable = s.a
    ),
    comp AS (
        SELECT node, CAST(LEAST(node, MIN(reachable)) AS BIGINT) AS component
        FROM reach GROUP BY node
    )
"""


@register(
    "dedup_connected_components",
    oracle=CC_ORACLE_CTES
    + """
    SELECT node AS doc_id, component
    FROM comp
    ORDER BY doc_id
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup grouping: connected components of the near-dup
    pair graph (A~B, B~C ⇒ one group even when A!~C) via distributed
    min-label propagation (operators.graph).  The oracle walks the
    same graph with a recursive CTE.  Keep-one-per-component = keep
    doc_id == component."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "len_bucket", (F.col("n_chars") / F.lit(50)).cast("long")
    )
    # NOT persisted (round-14): the CC loop's lazy localCheckpoint
    # materializes the pair pipeline exactly once per run, so a cache
    # here has a single consumer — under the charge-per-run harness it
    # was pure fill overhead (the r13 cache only paid off via warm
    # cross-query sharing, which the honest harness releases).
    pairs = ngram_jaccard_pairs(
        docs, block_cols=("lang", "len_bucket"), shingle_k=3, threshold=0.5
    )
    return (
        connected_components(pairs)
        .select(F.col("node").alias("doc_id"), F.col("component").cast("long"))
        .orderBy("doc_id")
    )


@register(
    "triangle_census_cooccurrence",
    oracle="""
    WITH e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY node
    ),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
           tri.n_triangles,
           ROUND(3.0 * tri.n_triangles /
                 NULLIF((SELECT SUM(d * (d - 1) / 2) FROM deg), 0),
                 6) AS global_clustering
    FROM tri
    """,
)
def triangle_census_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global clustering coefficient of the part
    co-occurrence graph (support ≥ 2) — the third graph primitive
    next to connected components (fixpoint) and PageRank (fixed
    budget): triangles need NO iteration, just the canonical
    ordered 3-way self-join (e1.u<e1.v=e2.u<e2.v, closing edge
    looked up directly), so each triangle is counted exactly once.

    Scale shape: the support floor (HAVING ≥ 2) is the classic edge
    sparsifier — it bounds the join fan-out before any pair math; the
    wedge count comes from degrees alone (no joins); all three legs
    of the triangle join are equi-joins on vertex keys that co-locate
    under one hash partitioning of the cached edge set.  The same
    census over a near-dup doc graph distinguishes clique-like
    template families (high clustering) from chain-like drift
    (low clustering) before choosing a dedup policy."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
        # Read by 3 triangle legs + the degree count in ONE plan.
        # Retention is intentional suite-level sharing: CacheManager
        # dedupes identical plans across invocations (no double
        # storage), the edge set is ≤ part-pair-sized, and it drops
        # with the session; per-sf_dir entries accumulate only across
        # distinct sf_dirs (bounded by the suite's 3).
    )
    edges = query_persist(edges)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    triangles = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        triangles.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(n_edges))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles") / F.nullif(F.col("n_wedges"), F.lit(0)),
                6,
            ).alias("global_clustering"),
        )
    )
