"""Bucketed-table ingestion for co-located joins (SURVEY.md §4).

At 100 TB the orders⋈customer / lineitem⋈orders shuffles dominate
query cost.  Writing both sides bucketed on the join key
(`bucketBy(n, key).sortBy(key)`) lets Spark plan a sort-merge join
with NO exchange on either side — the shuffle is paid once at ingest
and amortized over every subsequent join.

Bucket-count guidance: buckets ≈ table_size / target_partition_size
(128-256 MB); both sides of a co-located join must share the bucket
count (or one must divide the other, with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

#: Star-schema bucketing spec: fact/dim tables that join on a key.
BUCKET_SPEC: dict[str, str] = {
    "orders": "o_custkey",
    "customer": "c_custkey",
}


def ingest_bucketed(
    spark: SparkSession,
    sf_dir: str,
    num_buckets: int = 8,
    spec: dict[str, str] | None = None,
    database: str | None = None,
    location: str | None = None,
) -> list[str]:
    """Write tables as bucketed+sorted managed tables; returns names.

    Tables land in the session warehouse as `{name}_bucketed`, or in
    ``database`` (created at ``location`` if given) — pass these when
    the session's default warehouse directory shouldn't receive files
    (e.g. a vanilla session whose warehouse is the cwd).
    """
    prefix = ""
    if database:
        loc = f" LOCATION '{location}'" if location else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
        prefix = f"{database}."
    created = []
    for name, key in (spec or BUCKET_SPEC).items():
        table_name = f"{prefix}{name}_bucketed"
        # Ingest-once semantics: the whole POINT of bucketing is that
        # the shuffle is paid at ingest and amortized over every later
        # join, so a same-session re-ingest of the same deterministic
        # source is skipped (a fresh session's in-memory catalog has
        # no entry and rebuilds) — but ONLY when the existing table's
        # bucket layout matches the request; a different num_buckets
        # or bucket column must rebuild, or the caller would silently
        # get back exchanges the layout exists to eliminate.
        if spark.catalog.tableExists(table_name):
            desc = {
                r["col_name"]: r["data_type"]
                for r in spark.sql(f"DESCRIBE FORMATTED {table_name}").collect()
            }
            if desc.get("Num Buckets") == str(num_buckets) and desc.get(
                "Bucket Columns"
            ) == f"[`{key}`]":
                created.append(table_name)
                continue
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        if location:
            # A fresh session's in-memory catalog has no entry for the
            # table, so the DROP above is a no-op — but the managed
            # location on disk survives the previous process and
            # saveAsTable refuses to reuse it (LOCATION_ALREADY_EXISTS).
            # Wipe the physical dir to keep ingest idempotent across
            # sessions.
            import shutil

            shutil.rmtree(
                os.path.join(location, f"{name}_bucketed"), ignore_errors=True
            )
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(num_buckets, key)
            .sortBy(key)
            .saveAsTable(table_name)
        )
        created.append(table_name)
    return created


def bucketed_join(spark: SparkSession, database: str | None = None) -> DataFrame:
    """orders⋈customer over the bucketed tables — shuffle-free when
    both sides share the bucket layout (verify with
    plans.audit.count_exchanges: 0 on the join inputs)."""
    prefix = f"{database}." if database else ""
    orders = spark.table(f"{prefix}orders_bucketed")
    customer = spark.table(f"{prefix}customer_bucketed")
    return orders.join(customer, orders.o_custkey == customer.c_custkey)
