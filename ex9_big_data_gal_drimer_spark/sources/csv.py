"""Error-tolerant CSV ingestion (SURVEY.md §2.1 S1).

The reference ingests a 16-column hotels CSV with
``read_csv_auto('hotels.csv', ignore_errors=true)`` (reference
main.py:30): schema inference, malformed rows dropped, quoted fields
with embedded newlines.  Spark equivalent, with two deliberate
differences:

- explicit schema instead of inference (deterministic; inference costs
  an extra full scan and can flip types between runs);
- ingest-once to Parquet: multiLine CSV is NOT splittable (one task
  reads the whole file), so at scale the CSV is a landing format only —
  the first job converts to Parquet and every query reads that
  (restores splittability, column pruning, predicate pushdown,
  SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: The reference's 16-column hotels schema (column list from the
#: reference report "Col 1..16"; types per SURVEY.md §1.2 — codes are
#: integral, everything else string; rating is a WORD, not a number).
HOTELS_SCHEMA = StructType(
    [
        StructField("countyCode", StringType()),
        StructField("countyName", StringType()),
        StructField("cityCode", LongType()),
        StructField("cityName", StringType()),
        StructField("HotelCode", LongType()),
        StructField("HotelName", StringType()),
        StructField("HotelRating", StringType()),
        StructField("Address", StringType()),
        StructField("Attractions", StringType()),
        StructField("Description", StringType()),
        StructField("FaxNumber", StringType()),
        StructField("HotelFacilities", StringType()),
        StructField("Map", StringType()),
        StructField("PhoneNumber", StringType()),
        StructField("PinCode", StringType()),
        StructField("HotelWebsiteUrl", StringType()),
    ]
)


def read_hotels_csv(
    spark: SparkSession, path: str, schema: StructType = HOTELS_SCHEMA
) -> DataFrame:
    """Read a hotels-style CSV: header, quoted multi-line fields,
    escaped quotes, malformed rows dropped (≈ DuckDB ignore_errors)."""
    return (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .option("mode", "DROPMALFORMED")
        .schema(schema)
        .csv(path)
    )


def ingest_csv_to_parquet(
    spark: SparkSession,
    csv_path: str,
    parquet_path: str,
    schema: StructType = HOTELS_SCHEMA,
    partition_by: str | None = None,
) -> DataFrame:
    """Land the CSV as Parquet once; return the Parquet-backed frame.

    ``partition_by`` (e.g. countyCode) enables partition pruning for
    per-country queries at scale.
    """
    df = read_hotels_csv(spark, csv_path, schema)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(parquet_path)
    return spark.read.parquet(parquet_path)


def parse_map_column(df: DataFrame, col: str = "Map") -> DataFrame:
    """X5 multimodal seed: split the `"lat|lon"` pipe-pair string the
    reference never parses (hotels.csv col 13) into a typed struct."""
    parts = F.split(F.col(col), r"\|")
    return df.withColumn(
        "coords",
        F.when(
            F.col(col).isNotNull() & (F.size(parts) == 2),
            F.struct(
                parts.getItem(0).cast("double").alias("lat"),
                parts.getItem(1).cast("double").alias("lon"),
            ),
        ),
    )
