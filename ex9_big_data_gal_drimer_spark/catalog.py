"""Table loading for the driver's star-schema testdata.

The reference re-scans its CSV once per query (reference
main.py:30,59,82,98,117,146 — six scans of hotels.csv).  Here every
table is a Parquet scan behind a DataFrame, so Catalyst prunes columns
and pushes predicates into the scan; nothing is eagerly materialized.

Scale note: at 100 TB these reads would be partitioned/bucketed tables
in a real catalog; the API is the same (`spark.read.parquet` →
`spark.table`), so callers are insulated from that switch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

#: All tables the driver generates (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — always broadcast-join these.
DIM_TABLES = {"region", "nation", "supplier", "part"}

#: Columns stored as INT64 TIMESTAMP(NANOS), which Spark surfaces as
#: LongType under spark.sql.legacy.parquet.nanosAsLong=true.  We convert
#: to timestamp_ntz (micro precision) so they behave like the other
#: timestamp columns and hash-match the DuckDB oracle.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame, normalizing timestamps."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # integer nano→micro division keeps full precision (a
            # double round-trip would lose it: 1.7e18 > 2^53).
            df = df.withColumn(
                col,
                F.expr(f"CAST(timestamp_micros({col} div 1000) AS timestamp_ntz)"),
            )
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Alias of :func:`load_table` for terse query code."""
    return load_table(spark, sf_dir, name)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
