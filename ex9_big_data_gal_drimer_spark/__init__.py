"""ex9_big_data_gal_drimer_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference coursework project Gal-Drimer/ex9_Big_Data_Gal_drimer
(read-only at /root/reference; DuckDB-backed batch analytics over a
hotels fact table, main.py:18-159), re-expressed Spark-first:

- DataFrame / Spark SQL logical plans, Catalyst does all optimization
  (SURVEY.md §4 — no custom rules needed for parity).
- Operator library generalizing the reference's six queries
  (SURVEY.md §2) onto arbitrary star schemas.
- LLM-data-pipeline extension operators: dedup (exact / n-gram Jaccard
  / MinHash-LSH), vector similarity search, text analysis, multimodal
  column plumbing (SURVEY.md §2.11).
- Batch-equivalent and Structured Streaming window operators.

Every operator is designed for 100 TB scale: broadcast joins for small
dims, no driver-side loops, blocked/LSH variants replacing quadratic
self-joins, AQE-friendly declarative plans.
"""

__version__ = "0.1.0"
