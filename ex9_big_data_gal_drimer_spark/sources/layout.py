"""Date-partitioned file layout for partition pruning (SURVEY.md §4).

Bucketing (sources/bucketed.py) eliminates the JOIN shuffle; this
module is the other half of physical design at 100 TB: directory
partitioning on a coarse date key so time-windowed scans read only
the matching partitions (partition pruning — the scan's
PartitionFilters), instead of all files with row-group skipping.

The write repartitions BY the partition column first, so each
partition directory receives one file instead of
one-file-per-task-per-partition — the small-files problem a
date-partitioned 100 TB table dies of when skipped.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: Partition column derived at ingest: month granularity keeps
#: partition counts sane (a 7-year fact table → ~84 dirs; day
#: granularity would be ~2.5k — still fine — but month matches the
#: rollup queries' grain).
PART_COL = "l_ship_month"


def ingest_partitioned(
    spark: SparkSession, sf_dir: str, table: str = "lineitem"
) -> str:
    """Write `table` date-partitioned under tmp; returns the path.

    Idempotent across sessions: plain path-based parquet with
    mode=overwrite (no catalog entry to collide with), and
    ingest-once within a lifetime of the layout dir — a completed
    write (_SUCCESS marker) of the same deterministic source is
    reused instead of rewritten, the nightly-ingest/every-query-read
    split the layout exists for.
    """
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"ex9_layout_{sf_tag}", table)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    df = load_table(spark, sf_dir, table).withColumn(
        PART_COL, F.date_format("l_shipdate", "yyyy-MM")
    )
    (
        df.repartition(F.col(PART_COL))
        .write.mode("overwrite")
        .partitionBy(PART_COL)
        .parquet(path)
    )
    return path


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ingest_sorted(
    spark: SparkSession,
    sf_dir: str,
    table: str = "lineitem",
    sort_col: str = "l_shipdate",
    n_files: int = 4,
    block_size: int = 128 * 1024,
) -> str:
    """Write `table` range-clustered and sorted on `sort_col`
    (`repartitionByRange` + `sortWithinPartitions`) — the row-group
    skipping half of data layout, complementing directory
    partitioning above.

    Directory partitioning prunes at FILE granularity and dies of
    small files below its grain; sort clustering prunes WITHIN files:
    every parquet row group carries [min,max] stats for the sort
    column, and because the data is globally range-ordered, a
    selective range predicate intersects only the few row groups
    covering that range — the rest are skipped by the pushed filter
    without decoding a page.  This is what keeps a 100 TB fact scan
    proportional to the predicate's selectivity when the predicate
    column is too fine-grained to partition by (timestamps,
    identifiers).  Row groups are written small (128 KB) so the
    skipping is observable at test scale; production uses the 128 MB
    default.

    Idempotent: path-keyed by scale factor, overwrite mode.
    """
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = os.path.join(
        tempfile.gettempdir(), f"ex9_sorted_{sf_tag}_{block_size}", table
    )
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    df = load_table(spark, sf_dir, table)
    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option("parquet.block.size", block_size)
        .parquet(path)
    )
    return path
