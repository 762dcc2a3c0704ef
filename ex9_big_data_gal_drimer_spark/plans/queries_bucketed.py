"""Driver-visible bucketed co-located join (SURVEY.md §4).

The 0-exchange bucketed join was previously pinned only by
tests/test_plan_audit.py; this registers it in the driver gate with a
plain-SQL oracle: the bucketed plan must produce byte-identical
results to the ordinary join it replaces.  The bucketed write happens
at plan construction (like the sketch store) into a /tmp-backed
database, so a vanilla driver session never writes into its working
directory.

Scale: bucketing pays the orders⋈customer shuffle ONCE at ingest —
every subsequent join on the bucket key plans a sort-merge join with
no exchange on either side, the single biggest repeated-shuffle
eliminator a 100 TB star schema has.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.bucketed import bucketed_join, ingest_bucketed
from .registry import register

_DB = "ex9_bucketed"


@register(
    "bucketed_join_segment_revenue",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def bucketed_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment via the CO-LOCATED join: both sides
    written bucketBy(8, custkey).sortBy(custkey), so the join itself
    plans with zero exchanges (test_plan_audit pins the plan; this
    entry pins the VALUES against the plain-join oracle)."""
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    db = f"{_DB}_{sf_tag}"
    ingest_bucketed(
        spark,
        sf_dir,
        num_buckets=8,
        database=db,
        location=os.path.join(tempfile.gettempdir(), f"{db}_wh"),
    )
    return (
        bucketed_join(spark, database=db)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
        .orderBy("c_mktsegment")
    )
