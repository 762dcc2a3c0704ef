"""Distributed k-means + SemDeDup-style semantic dedup (SURVEY.md
§2.11 X3 extension).

SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public literature)
deduplicates a corpus by clustering embeddings and dropping
near-identical pairs *within* clusters, so the quadratic pair work is
bounded by cluster size instead of corpus size.  The same trained
centroids also upgrade the IVF ANN index (operators/similarity.py):
`kmeans_fit` returns the exact (centroid_id, cvec) schema
`ivf_cosine_topk` consumes, making it the "swap in trained centroids"
path its docstring promises.

Execution model: Lloyd iterations as DataFrame jobs.  Assignment is a
ZERO-SHUFFLE map-side expression: the model is k×dim doubles (driver-
sized by definition — it round-trips through the driver every Lloyd
iteration anyway), so the centroids are inlined as literal arrays and
the per-row argmax is `array_position(sims, array_max(sims))` inside
whole-stage codegen.  No crossJoin row blow-up, no groupBy(id)
re-shuffle of the corpus — the pre-round-3 form paid one k×n shuffle
per assignment pass.  The centroid update is one posexplode +
map-side-combining average keyed on (cluster, dim position) — shuffle
volume is O(k·dim) post-combine, never vectors-to-one-node.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _centroid_rows(centroids: DataFrame) -> list[tuple[int, list[float]]]:
    """Collect a (centroid_id, cvec) table to driver model state —
    k rows by contract, the same size the Lloyd loop already holds."""
    return sorted(
        (r["centroid_id"], list(r["cvec"])) for r in centroids.collect()
    )


def _scaled_sims(vec: Column, rows: list[tuple[int, list[float]]]) -> Column:
    """Array of per-centroid `dot(v, c)/|c|` — cosine scaled by the
    row-constant |v|, which cannot change any per-row argmax or
    ordering, so the |v| fold is dropped from the hot expression.
    The |c| norms are plain Python floats (model-side)."""
    import math

    sims = []
    for _, cvec in rows:
        nc = math.sqrt(sum(x * x for x in cvec)) or 1.0
        lit = F.array(*[F.lit(float(x) / nc) for x in cvec])
        sims.append(
            F.aggregate(
                F.zip_with(vec, lit, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*sims)


def nearest_centroid_expr(
    vec: Column, rows: list[tuple[int, list[float]]]
) -> Column:
    """Map-side nearest-centroid id (max cosine; ties → smallest id —
    `array_position` returns the FIRST maximum and `rows` is
    id-sorted, matching the old `max_by(struct(sim, -id))` break)."""
    sims = _scaled_sims(vec, rows)
    ids = F.array(*[F.lit(int(cid)) for cid, _ in rows])
    return F.element_at(ids, F.array_position(sims, F.array_max(sims)).cast("int"))


def top_centroids_expr(
    vec: Column, rows: list[tuple[int, list[float]]], n_best: int
) -> Column:
    """Map-side array of the `n_best` nearest centroid ids (desc
    cosine, ties → smallest id), for multi-probe assignment."""
    sims = _scaled_sims(vec, rows)
    ids = F.array(*[F.lit(int(cid)) for cid, _ in rows])
    ranked = F.array_sort(
        F.zip_with(
            sims, ids, lambda s, i: F.struct((-s).alias("ns"), i.alias("cid"))
        )
    )
    return F.transform(F.slice(ranked, 1, n_best), lambda t: t["cid"])


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Lloyd's k-means with cosine assignment; returns the trained
    centroid table as (centroid_id INT, cvec ARRAY<DOUBLE>).

    Init is deterministic and data-driven without an RNG: the k
    corpus vectors with the smallest xxhash64(id) — a seeded uniform
    draw in expectation, reproducible across runs and partitionings
    (TakeOrderedAndProject, no full sort).
    """
    spark = emb.sparkSession
    init = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    # Centroid state stays in Python between iterations (it was
    # collected anyway) — one Spark action per Lloyd round, not two.
    state = {i: list(r[vec_col]) for i, r in enumerate(init)}

    def as_df():
        return spark.createDataFrame(
            sorted(state.items()), "centroid_id INT, cvec ARRAY<DOUBLE>"
        )

    for _ in range(n_iter):
        # Assignment straight from the Python model state: no
        # createDataFrame/collect round-trip mid-loop, map-only plan.
        rows = sorted((cid, v) for cid, v in state.items())
        assigned = emb.select(
            id_col,
            vec_col,
            nearest_centroid_expr(F.col(vec_col), rows).alias("centroid_id"),
        )
        new_rows = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.transform(F.col("pm"), lambda s: s["m"]).alias("cvec"),
            )
            .collect()
        )
        # Empty clusters keep their previous centroid (standard Lloyd
        # fallback) so the table stays k rows.
        state.update({r["centroid_id"]: list(r["cvec"]) for r in new_rows})
    return as_df()


def kmeans_fit_or_load(
    emb: DataFrame,
    store_path: str,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Load the trained centroid table from `store_path` if present,
    else fit and persist it there — the train-once-serve-many contract
    a production ANN index runs under (the model analogue of the
    sketch store: persisted state consulted by later sessions instead
    of recomputed).  The store is a tiny parquet (k rows); a schema
    mismatch or unreadable store falls back to a fresh fit+write.
    """
    spark = emb.sparkSession
    try:
        stored = spark.read.parquet(store_path)
        if set(stored.columns) == {"centroid_id", "cvec"}:
            return stored
    except Exception:
        pass
    centroids = kmeans_fit(emb, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    centroids.write.mode("overwrite").parquet(store_path)
    return spark.read.parquet(store_path)


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Nearest-centroid (max cosine) assignment as a ZERO-SHUFFLE
    projection: the k-row centroid table is collected to driver model
    state (it is the model — k×dim doubles) and inlined as a literal,
    so assignment runs entirely inside whole-stage codegen with no
    crossJoin blow-up and no groupBy(id) re-shuffle of the corpus.
    Carries the vector through for downstream pair work."""
    rows = _centroid_rows(centroids)
    return emb.select(
        id_col,
        nearest_centroid_expr(F.col(vec_col), rows).alias("centroid_id"),
        vec_col,
    )


def semdedup_pairs(
    assigned: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "v",
    sim_scale: int = 4,
) -> DataFrame:
    """Within-cluster cosine pairs at or above `threshold` —
    (cluster_id, id_a, id_b, cosine_sim) over `assign_clusters`
    output.  A dedup pass drops id_b.

    The cluster id is the blocking key: pair cost is quadratic only
    within a cluster (the SemDeDup contract — k bounds the block
    size), and the self-join is an equi-join on centroid_id, so
    candidates co-locate by one hash shuffle.  Each row's L2 norm is
    computed ONCE before the join (a per-row projection the join
    boundary keeps out of the pair loop), so the per-pair work is a
    single dot-product fold + one divide instead of dot + two norms —
    3× fewer interpreted HOF element ops in the quadratic stage,
    where it matters.
    """
    from ..functions import dot, l2_norm

    normed = assigned.select(
        id_col, "centroid_id", vec_col, l2_norm(F.col(vec_col)).alias("__n")
    )
    par = assigned.sparkSession.sparkContext.defaultParallelism
    a = normed.repartition(par, F.col("centroid_id")).alias("a")
    b = normed.alias("b")
    sim = F.round(
        dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        / (F.col("a.__n") * F.col("b.__n")),
        sim_scale,
    )
    return (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col("a.centroid_id").alias("cluster_id"),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
