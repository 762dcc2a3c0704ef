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
    mode=overwrite (no catalog entry to collide with).
    """
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), f"ex9_layout_{sf_tag}", table)
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
