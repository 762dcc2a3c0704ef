"""Third relational tranche: multiset ops, exact percentiles, pivot,
edit-distance near-dup, and dedup application (SURVEY.md §2.7/§2.4,
§2.11 X1/X2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from .registry import register


@register(
    "multiset_ops_lineitem",
    oracle="""
    WITH ship AS (SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'O'),
         ret  AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT l_orderkey, COUNT(*) AS multiplicity FROM (
        SELECT * FROM ship INTERSECT ALL SELECT * FROM ret
    )
    GROUP BY l_orderkey
    ORDER BY multiplicity DESC, l_orderkey
    LIMIT 20
    """,
)
def multiset_ops_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — intersectAll keeps multiplicity,
    unlike the set-ops query's distinct forms)."""
    li = table(spark, sf_dir, "lineitem")
    ship = li.filter(F.col("l_linestatus") == "O").select("l_orderkey")
    ret = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        ship.intersectAll(ret)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .orderBy(F.desc("multiplicity"), "l_orderkey")
        .limit(20)
    )


@register(
    "order_price_quantiles",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
           ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`).  At 100 TB switch to `approx_percentile` —
    exact percentile is a sort-heavy aggregate; the approx form is a
    fixed-size sketch."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # one percentile buffer for all three points — three scalar
            # percentile() aggs would sort/buffer the column thrice
            F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("__p"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.round(F.col("__p")[0], 2).alias("median_price"),
            F.round(F.col("__p")[1], 2).alias("p90_price"),
            F.round(F.col("__p")[2], 2).alias("p99_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS urgent,
           CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS high,
           CAST(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS medium,
           CAST(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS not_specified,
           CAST(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS low
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts, status rows × priority columns.
    Explicit value list keeps the pivot single-pass (no extra distinct
    scan) and the output schema static — required at scale."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
        .na.fill(0)
        .select(
            "status",
            F.col("1-URGENT").alias("urgent"),
            F.col("2-HIGH").alias("high"),
            F.col("3-MEDIUM").alias("medium"),
            F.col("4-NOT SPECIFIED").alias("not_specified"),
            F.col("5-LOW").alias("low"),
        )
        .orderBy("status")
    )


@register(
    "levenshtein_similar_parts",
    oracle="""
    SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
           levenshtein(a.p_name, b.p_name) AS edit_distance
    FROM part a
    JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 8
    ORDER BY edit_distance, partkey_a, partkey_b
    LIMIT 50
    """,
)
def levenshtein_similar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 edit-distance near-dup (SURVEY.md §2.11): top-50 brand-blocked
    part-name pairs by levenshtein distance (<= 8).

    Round-9 staged top-k plan (Fagin-style tiered search): the result
    order is (edit_distance, keys), so candidate TIERS can be
    enumerated in distance order and enumeration stops at the first
    tier that fills k.  Tier 0 — identical names within a brand — is
    an EQUI-join on (brand, name), so when a cheap sufficiency count
    shows >= 50 distance-0 pairs (one small aggregate action; hence
    this query's ITERATIVE_CONSTRUCTION entry), the quadratic
    theta-join tier is never built.  Two exact prunes inside tier 0:
    only duplicated (brand, name) groups join, and each group is
    trimmed to its 51 smallest partkeys first — any pair reaching a
    52nd-or-later key is lexicographically dominated by at least 50
    pairs inside the trimmed set (the group minimum pairs with the 50
    keys above it), so the global top-50 is unaffected.  Measured at
    sf1: 142 s exhaustive -> 1.5 s staged under bench conditions
    (warm cache; ~5 s with a cold session scan), identical 50 rows.

    Fallback tier (fewer than 50 exact-dup pairs, e.g. sf0.001 with 9)
    is the exhaustive brand-blocked scan: length-difference guard
    (|len a - len b| <= k is implied by distance <= k) skips the DP
    for most pairs, and the bounded-threshold levenshtein(a, b, 8)
    runs O(n*k) with early exit instead of O(n*m).

    Scale shape: tier 0 is O(duplicate groups) — 51-row-capped groups,
    never quadratic in the corpus; the quadratic fallback only ever
    runs on inputs too small for tier 0 to fill k.  At corpus scale
    the same bounded verify runs after MinHash candidate generation
    (edit_distance_verify_lsh), not over exhaustive blocks."""
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    dup_groups = (
        part.groupBy("p_brand", "p_name")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    n_tier0 = (
        dup_groups.select(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs")
        ).collect()[0].pairs
        or 0
    )
    if n_tier0 >= 50:
        w = Window.partitionBy("p_brand", "p_name").orderBy("p_partkey")
        trimmed = (
            part.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 51)
            .drop("rn")
        )
        a = trimmed.alias("a")
        b = trimmed.alias("b")
        return (
            a.join(
                b,
                (F.col("a.p_brand") == F.col("b.p_brand"))
                & (F.col("a.p_name") == F.col("b.p_name"))
                & (F.col("a.p_partkey") < F.col("b.p_partkey")),
            )
            .select(
                F.col("a.p_partkey").alias("partkey_a"),
                F.col("b.p_partkey").alias("partkey_b"),
                F.levenshtein(
                    F.col("a.p_name"), F.col("b.p_name"), 8
                ).alias("edit_distance"),
            )
            .orderBy("edit_distance", "partkey_a", "partkey_b")
            .limit(50)
        )
    # single-file source → one input partition; spread the probe side
    # so the pair evaluation parallelizes (the build side broadcasts)
    par = spark.sparkContext.defaultParallelism
    a = part.repartition(par, F.col("p_partkey")).alias("a")
    b = part.alias("b")
    len_guard = (
        F.abs(F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))) <= 8
    )
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 8)
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & len_guard,
        )
        .select(
            F.col("a.p_partkey").alias("partkey_a"),
            F.col("b.p_partkey").alias("partkey_b"),
            dist.alias("edit_distance"),
        )
        .filter((F.col("edit_distance") >= 0) & (F.col("edit_distance") <= 8))
        .orderBy("edit_distance", "partkey_a", "partkey_b")
        .limit(50)
    )


@register(
    "unpivot_priority_counts",
    oracle="""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
           CASE o_orderpriority
                WHEN '1-URGENT' THEN 'urgent'
                WHEN '2-HIGH' THEN 'high'
                WHEN '3-MEDIUM' THEN 'medium'
                WHEN '4-NOT SPECIFIED' THEN 'not_specified'
                ELSE 'low'
           END AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    ORDER BY month, priority
    """,
)
def unpivot_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long (`unpivot`, the pivot's inverse): monthly order
    counts pivoted to one column per priority, then melted back to
    (month, priority, n_orders) rows.  The oracle states the
    equivalent long-form aggregation directly — pivot∘unpivot must be
    the identity on the populated cells (absent combinations become
    pivot NULLs → filled 0 → filtered out to match).

    Scale: pivot with an explicit value list is a single-pass
    aggregate into 5 columns; unpivot is a map-side expand (5 rows
    per input row, no shuffle)."""
    orders = table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
        )
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
        .na.fill(0)
        .withColumnsRenamed(
            {
                "1-URGENT": "urgent",
                "2-HIGH": "high",
                "3-MEDIUM": "medium",
                "4-NOT SPECIFIED": "not_specified",
                "5-LOW": "low",
            }
        )
    )
    return (
        wide.unpivot(
            "month",
            ["urgent", "high", "medium", "not_specified", "low"],
            "priority",
            "n_orders",
        )
        .filter(F.col("n_orders") > 0)
        .orderBy("month", "priority")
    )


@register(
    "dedup_apply_ngram",
    oracle="""
    WITH toks AS (
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
    ), dup_pairs AS (
        SELECT b.doc_id AS drop_id
        FROM shingled a
        JOIN shingled b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket
             AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.5
    )
    SELECT d.lang,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars_kept
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM dup_pairs p WHERE p.drop_id = d.doc_id)
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def dedup_apply_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 applied end-to-end: documents with greedy near-dup removal
    (drop every doc that appears as the higher-id side of a ≥0.5
    Jaccard pair) → surviving corpus stats per language.  The drop set
    comes from the inverted-index pair operator; removal is a
    left-anti join — the standard keep/drop shape of a pre-training
    dedup pass."""
    from ..operators.dedup import ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs.withColumn("len_bucket", (F.col("n_chars") / F.lit(50)).cast("long")),
        block_cols=("lang", "len_bucket"),
        shingle_k=3,
        threshold=0.5,
    )
    drops = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
    return (
        docs.join(drops, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_chars").cast("long").alias("total_chars_kept"),
        )
        .orderBy("lang")
    )


@register(
    "skew_salted_revenue",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def skew_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join, oracle-checked: revenue per market segment
    through an EXPLICITLY SALTED orders⋈customer join
    (operators/skew.py) — the fact side salts on its row key
    (o_orderkey, unique, so a hot customer spreads across all salt
    buckets), the customer side replicates ×8, and the join key
    becomes (custkey, salt).  Results are identical to the plain join
    (that IS the oracle), which upgrades the salting operator from
    property-test-only to driver-oracle-confirmed.  Use when one key
    dominates and AQE skew-split isn't available (streaming joins,
    forced shuffle-hash)."""
    from ..operators.skew import salted_join

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        o, c, "o_custkey", "c_custkey", num_salts=8, salt_from="o_orderkey"
    )
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
        .orderBy("segment")
    )
