"""Vector similarity search operators (SURVEY.md §2.11 X3).

- brute_force_topk: exact cosine top-k of query vectors against the
  corpus; query side broadcast.  The correctness baseline.
- lsh_cosine_topk: random-hyperplane LSH (sign-bucket hashing) —
  candidates share a hash bucket in ≥1 of `num_tables` tables; exact
  cosine re-rank on candidates only.  The 100 TB path: bucketing is a
  broadcast join against a (num_tables × hash_bits)-row hyperplane
  table + one narrow shuffle; the candidate join is bucket-equi,
  never a cross product.

Hyperplanes come from a seeded RNG on the driver (tiny) and ship as a
broadcast DataFrame — keeping the logical plan small (a literal-folded
variant produced 10 MiB task binaries and minutes of analysis time).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import cosine_similarity, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "v",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    sim_scale: int = 4,
) -> DataFrame:
    """Exact cosine top-k per query; ranking on ROUNDed sim for
    cross-engine determinism."""
    sim = F.round(
        cosine_similarity(F.col(query_vec_col), F.col(vec_col)), sim_scale
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), "neighbor_id")
    return (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col, F.col(id_col).alias("neighbor_id"), sim.alias("sim")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _plane_rows(dim: int, num_tables: int, hash_bits: int, seed: int) -> list:
    """(table_id, bit, plane) hyperplane model rows — seeded driver-side
    RNG, tiny (num_tables × hash_bits × dim doubles)."""
    rng = random.Random(seed)
    return [
        (t, b, [rng.gauss(0.0, 1.0) for _ in range(dim)])
        for t in range(num_tables)
        for b in range(hash_bits)
    ]


def _bucket_ids(
    df: DataFrame, plane_rows: list, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec) → (id, table_id, bucket): sign-bit LSH bucket per
    table, as ONE zero-shuffle Arrow pass with the hyperplane model in
    the task closure (the same model-in-closure shape as
    clustering.assign_ids).

    Round-13 (guide §2.4/§4): the previous form broadcast-joined a
    planes TABLE (fanning each row ×(tables·bits)), evaluated the dot
    as an interpreted HOF fold (CodegenFallback — a dedicated
    32-partition repartition existed just to spread that CPU) and
    re-aggregated the fan-out by (id, table) — a full exchange per
    side.  The numpy pass accumulates the dot SEQUENTIALLY over the
    dimension axis — the identical left-to-right IEEE order as the
    HOF fold ((0.0 + v0·p0) + v1·p1 + …) — so every sign bit, bucket
    id, candidate set and final row is byte-identical.

    The vector payload still never transits an exchange: the pass is
    map-side and emits only (id, table_id, bucket) longs."""
    import numpy as np

    tb = [(t, b) for t, b, _ in plane_rows]
    planes = [p for _, _, p in plane_rows]
    num_tables = 1 + max(t for t, _ in tb)
    id_type = {f.name: f.dataType.simpleString() for f in df.schema.fields}[
        id_col
    ]

    def f(batches):
        import pandas as pd

        P = np.asarray(planes)  # (T*B, dim)
        dim = P.shape[1]
        tables = np.asarray([t for t, _ in tb])
        shifts = np.asarray([1 << b for _, b in tb], dtype=np.int64)
        t_ids = np.arange(num_tables)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy())
            # Sequential accumulation over the dimension axis keeps
            # the HOF fold's exact IEEE summation order.
            acc = np.zeros((len(X), P.shape[0]))
            for d in range(dim):
                acc += X[:, d, None] * P[None, :, d]
            bit_values = (acc > 0).astype(np.int64) * shifts[None, :]
            buckets = np.zeros((len(X), num_tables), dtype=np.int64)
            for j, t in enumerate(tables):
                buckets[:, t] += bit_values[:, j]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), num_tables),
                    "table_id": np.tile(t_ids, len(X)),
                    "bucket": buckets.ravel(),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        f, f"{id_col} {id_type}, table_id INT, bucket BIGINT"
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_tables: int = 16,
    hash_bits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "v",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    sim_scale: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH candidates +
    exact re-rank.

    P[one-table collision] = (1 - theta/pi)^hash_bits.  Defaults
    (16 tables × 4 bits) are tuned for corpora whose nearest
    neighbors sit at modest similarity (theta ≈ 70° → ≥1-of-16 ≈ 0.9
    recall); for tightly clustered corpora raise hash_bits to cut the
    candidate count — selectivity, not recall, is the binding
    constraint there.
    """
    planes = _plane_rows(dim, num_tables, hash_bits, seed)

    cb = _bucket_ids(corpus, planes, id_col, vec_col)
    qb = _bucket_ids(
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qv")
        ),
        planes,
        "__qid",
        "__qv",
    )

    # Candidate ids only — vectors are re-attached afterwards, so the
    # bucket join and the dedup shuffle move nothing but ids.
    cand_ids = (
        cb.join(
            F.broadcast(qb),
            (cb.table_id == qb.table_id)
            & (cb.bucket == qb.bucket)
            & (F.col(id_col) != F.col("__qid")),
        )
        .select(F.col("__qid").alias(query_id_col), id_col)
        .dropDuplicates([query_id_col, id_col])
    )

    # Re-fetch vectors: corpus side by equi-join (one shuffle of the
    # candidate-hit subset at scale), query side broadcast (tiny).
    candidates = cand_ids.join(
        corpus.select(id_col, vec_col), id_col
    ).join(
        F.broadcast(
            queries.select(
                F.col(query_id_col), F.col(query_vec_col)
            )
        ),
        query_id_col,
    )

    sim = F.round(
        cosine_similarity(F.col(query_vec_col), F.col(vec_col)), sim_scale
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), "neighbor_id")
    return (
        candidates.select(
            query_id_col, F.col(id_col).alias("neighbor_id"), sim.alias("sim")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def vectorized_topk(
    corpus: DataFrame,
    queries_pdf,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "v",
    sim_scale: int = 4,
) -> DataFrame:
    """Arrow-vectorized brute-force cosine top-k: numpy matmul inside
    mapInPandas.

    The JVM-expression form (brute_force_topk) folds the dot product
    element-by-element per pair; for wide embeddings the BLAS matmul
    over Arrow batches is the faster path — this is the documented
    "Python unavoidable → Arrow-batched, never per-row" pattern
    (row-at-a-time UDFs are 10-100× slower).

    `queries_pdf` is a small pandas frame (query_id, qv) shipped in
    the task closure — queries are few, the corpus is the big side and
    streams through in batches.  Per-batch local top-k keeps the
    shuffle tiny; the final window picks the global top-k.
    """
    import numpy as np
    import pandas as pd

    q_ids = queries_pdf["query_id"].to_numpy()
    q_mat = np.stack(queries_pdf["qv"].to_numpy())  # (Q, D)
    q_norm = np.linalg.norm(q_mat, axis=1)

    out_schema = "query_id long, neighbor_id long, sim double"

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy())  # (N, D)
            sims = (mat @ q_mat.T) / (
                np.linalg.norm(mat, axis=1)[:, None] * q_norm[None, :]
            )
            sims = np.round(sims, sim_scale)
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = ids != qid
                cids, csims = ids[mask], col[mask]
                if len(cids) > k:
                    # local top-k per batch bounds the shuffle; exact
                    # lexical order (sim desc, id asc) so boundary ties
                    # resolve identically to the global window
                    keep = np.lexsort((cids, -csims))[:k]
                    cids, csims = cids[keep], csims[keep]
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cids, "sim": csims}
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def quantize_int8(vec: F.Column) -> F.Column:
    """Per-vector symmetric int8 scalar quantization:
    ``q[i] = round(127 * v[i] / max|v|)``.

    Cosine similarity is invariant under per-vector positive scaling,
    so cosine(qa, qb) ≈ cosine(a, b) with only rounding error
    (~1/127 per component) — no global statistics pass, no codebook,
    map-side only.  The point at 100 TB is BYTES: an int8 array is
    ~8× smaller than array<double> on scan, shuffle and cache, which
    is where embedding workloads actually spend — hence the TINYINT
    element type (values are bounded to [-127, 127]; the cosine fold
    casts each element to double before multiplying, so the byte type
    never overflows under ANSI arithmetic).

    Edge case: an all-zero vector has max|v| = 0 and no meaningful
    direction; it quantizes to all-zero (guarded division) and its
    cosine against anything is NULL-safe zero downstream, matching
    brute_force_topk's handling."""
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    return F.transform(
        vec,
        lambda x: F.when(amax > 0, F.round(F.lit(127.0) * x / amax))
        .otherwise(F.lit(0))
        .cast("tinyint"),
    )


def sq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank_factor: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "v",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    sim_scale: int = 4,
) -> DataFrame:
    """Scalar-quantized cosine top-k with exact re-rank: score every
    (query, doc) pair on the int8 representations, keep the top
    ``rerank_factor × k`` candidates per query, then exact-cosine only
    those on the full-precision vectors.

    Complements the LSH/IVF paths: same brute-force candidate
    asymptotics, but the quantized corpus representation is ~8×
    smaller — this is the variant for corpora that are scanned
    repeatedly (the quantized columns live in cache / a slim parquet
    projection) where candidate pruning is not worth its recall risk.
    The exact re-rank touches only rerank_factor×k×|queries| vectors.
    """
    cq = corpus.select(
        id_col, vec_col, quantize_int8(F.col(vec_col)).alias("v8")
    )
    qq = queries.select(
        query_id_col,
        query_vec_col,
        quantize_int8(F.col(query_vec_col)).alias("q8"),
    )

    approx = F.round(
        cosine_similarity(F.col("q8"), F.col("v8")), sim_scale
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim_q"), "neighbor_id")
    cands = (
        cq.crossJoin(F.broadcast(qq))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            query_vec_col,
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__nv"),
            approx.alias("sim_q"),
        )
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= rerank_factor * k)
    )

    sim = F.round(cosine_similarity(F.col(query_vec_col), F.col("__nv")), sim_scale)
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), "neighbor_id")
    return (
        cands.select(query_id_col, "neighbor_id", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
    )


def _random_centroid_rows(
    dim: int, num_centroids: int, seed: int
) -> list[tuple[int, list[float]]]:
    """Seeded spherical quantizer as plain driver rows — no Spark
    round-trip, so building an IVF plan over random centroids stays
    action-free (the lazy-construction pin in test_plan_audit)."""
    rng = random.Random(seed)
    return [
        (c, [rng.gauss(0.0, 1.0) for _ in range(dim)])
        for c in range(num_centroids)
    ]


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "v",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    sim_scale: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed approximate cosine top-k (the inverted-file ANN
    pattern, complementing the hyperplane-LSH variant).

    A seeded spherical quantizer (random gaussian centroids — k-means
    with zero iterations, so centroid creation needs NO data action)
    partitions the corpus into `num_centroids` inverted lists with one
    broadcast argmax pass; each query probes its `nprobe` nearest
    lists and exact-re-ranks only those lists' members.

    Scale shape: centroid table is tiny (broadcast); corpus
    assignment is map-side + one (id, centroid) shuffle of longs; the
    candidate join is an equi-join on centroid_id.  Expected work per
    query ≈ nprobe/num_centroids of the corpus — tune the ratio for
    the recall/cost point.  Untrained random centroids on a weakly
    clustered corpus (this testdata: true neighbors at cosine ~0.3)
    need nprobe ≈ num_centroids/2 for ~0.6 recall; production swaps in
    TRAINED (k-means) centroids — same plan, far better list purity —
    and that is the first knob to turn before raising nprobe.  Pass
    `centroids` (centroid_id INT, cvec ARRAY<DOUBLE> — the
    operators.clustering.kmeans_fit output) to use that trained path;
    `num_centroids`/`seed` are ignored then.
    """
    from .clustering import _centroid_rows, assign_ids

    # The quantizer is the MODEL — k×dim doubles, driver-sized by
    # contract — so assignment is a zero-shuffle Arrow-vectorized
    # argmax pass (operators/clustering.py::assign_ids): no crossJoin
    # row blow-up, no per-id groupBy/window re-shuffle of the corpus.
    # Random centroids are generated driver-side (no action); a
    # caller-provided centroid TABLE is collected — model-sized, and
    # those callers register as ITERATIVE_CONSTRUCTION.
    cent_rows = (
        _centroid_rows(centroids)
        if centroids is not None
        else _random_centroid_rows(dim, num_centroids, seed)
    )

    corpus_lists = assign_ids(
        corpus, cent_rows, id_col, vec_col, 1, keep_vec=True
    )
    query_probes = assign_ids(
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.col(query_vec_col).alias("__qv"),
        ),
        cent_rows,
        "__qid",
        "__qv",
        nprobe,
    )

    # (query, candidate) pairs are UNIQUE by construction — each corpus
    # vector sits in exactly one list (n_best=1) and a query's nprobe
    # probes are distinct lists — so the old dropDuplicates was a
    # no-op exchange; carrying the corpus vector through the map-side
    # broadcast probe join (keep_vec) also removes the candidate-id
    # re-join against the corpus for its vectors (round-13, guide
    # §2.4: remove shuffles outright).
    candidates = (
        corpus_lists.join(F.broadcast(query_probes), "centroid_id")
        .filter(F.col(id_col) != F.col("__qid"))
        .select(F.col("__qid").alias(query_id_col), id_col, vec_col)
        .join(
            F.broadcast(queries.select(query_id_col, query_vec_col)),
            query_id_col,
        )
    )

    sim = F.round(
        cosine_similarity(F.col(query_vec_col), F.col(vec_col)), sim_scale
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), "neighbor_id")
    return (
        candidates.select(
            query_id_col, F.col(id_col).alias("neighbor_id"), sim.alias("sim")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
