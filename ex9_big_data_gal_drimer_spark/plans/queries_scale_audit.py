"""Scale observability: the pre-join skew audit (SURVEY.md §4 /
§2.11 scale tier; reference has no counterpart).

``join_key_skew_audit`` profiles the per-key row distribution of the
engine's three hottest join keys (lineitem.l_orderkey,
lineitem.l_partkey, orders.o_custkey) — key count, hottest-key share,
and the p50/p99 per-key-count order statistics whose ratio is the
skew signal.  This is the diagnostic that DECIDES the mitigations the
engine already ships (skew_salted_revenue's salting, AQE skew-join
splitting): at 100 TB you run this on yesterday's partition before
picking a join strategy, because a 1000× hot key turns one reducer
into the job's critical path.

Determinism: everything is counts of rows (exact BIGINTs), the
hot-key share is a ratio of exact integers, and the percentiles are
ORDER STATISTICS (exact elements at rank floor(q·(n−1))+1 — the
adaptive_quality_threshold contract), so the whole audit is
hash-exact across engines.

Scale shape: one partial-agg groupBy per audited key (map-side
combine ⇒ the shuffle carries |keys| rows, not |rows|); the
per-key-count stats run over aggregate-grain rows only (global
windows above aggregates — the plan-audit-sanctioned shape); the
three branches union into one result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register

#: (relation, key column) pairs audited — the engine's hottest join keys.
_AUDITED = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
]


def _branch_sql(rel: str, key: str) -> str:
    return f"""
        SELECT '{rel}' AS relation, '{key}' AS join_key,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
               ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS max_share,
               CAST(MAX(CASE WHEN rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
                             THEN cnt END) AS BIGINT) AS p50_key_rows,
               CAST(MAX(CASE WHEN rn = CAST(FLOOR(0.99 * (n - 1)) AS BIGINT) + 1
                             THEN cnt END) AS BIGINT) AS p99_key_rows
        FROM (
            SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt) AS rn,
                   COUNT(*) OVER () AS n
            FROM (SELECT {key}, COUNT(*) AS cnt FROM {rel} GROUP BY {key})
        )
    """


@register(
    "join_key_skew_audit",
    oracle=" UNION ALL ".join(_branch_sql(r, k) for r, k in _AUDITED)
    + " ORDER BY relation, join_key",
)
def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key distribution profile of the hottest join keys: row and
    key counts, hottest-key share, p50/p99 per-key-count order
    statistics.  p99 ≫ p50 or max_share ≫ 1/n_keys ⇒ salt the join or
    lean on AQE skew splitting; flat ⇒ plain hash join is safe."""
    branches = []
    for rel, key in _AUDITED:
        counts = (
            table(spark, sf_dir, rel)
            .groupBy(F.col(key))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.orderBy("cnt")
        ranked = counts.select(
            "cnt",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        stat = lambda q: F.max(  # noqa: E731 — order-statistic picker
            F.when(
                F.col("rn") == F.floor(F.lit(q) * (F.col("n") - 1)).cast("long") + 1,
                F.col("cnt"),
            )
        ).cast("long")
        branches.append(
            ranked.agg(
                F.lit(rel).alias("relation"),
                F.lit(key).alias("join_key"),
                F.sum("cnt").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("cnt").alias("max_key_rows"),
                F.round(
                    F.max("cnt").cast("double") / F.sum("cnt"), 6
                ).alias("max_share"),
                stat(0.5).alias("p50_key_rows"),
                stat(0.99).alias("p99_key_rows"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out.orderBy("relation", "join_key")
