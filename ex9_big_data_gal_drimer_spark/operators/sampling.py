"""Sampling operators (SURVEY.md §2.9 R1/R2).

The reference samples each query result to ≤500 rows with a fixed seed
before persisting (pandas ``sample(n=min(500, len), random_state=42)``,
reference main.py:257-258) and carries a dead-code stratified variant
(main.py:259-262).  Spark equivalents:

- seeded_sample_n: exact-n seeded sample via sort-by-rand + limit.
  Row-identical parity with pandas is impossible (different RNGs —
  SURVEY.md §7 risk register); parity is distributional: exact n,
  deterministic for a fixed seed, uniform.
- stratified_sample: quota-per-stratum via a rand-ordered row_number
  window (exact quotas, unlike fraction-based ``sampleBy``).
- sample_by_fractions: thin wrapper over ``df.sampleBy`` for the
  fraction-based form (single pass, no shuffle — the 100 TB default).

Scale note: sort-by-rand is a global sort — fine for the ≤500-row
result-table use case it serves, wrong for sampling a 100 TB fact
table (use sample_by_fractions / df.sample there, one map pass).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def seeded_sample_n(df: DataFrame, n: int = 500, seed: int = 42) -> DataFrame:
    """Exact-n uniform sample, deterministic for a fixed seed."""
    return df.orderBy(F.rand(seed)).limit(n)


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    quota_per_stratum: int,
    seed: int = 42,
) -> DataFrame:
    """Exact quota-per-stratum sample (reference main.py:259-262 made
    scalable: window per stratum instead of pandas groupby-apply)."""
    w = Window.partitionBy(*strata_cols).orderBy(F.rand(seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota_per_stratum)
        .drop("__rn")
    )


def sample_by_fractions(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[object, float],
    seed: int = 42,
) -> DataFrame:
    """Fraction-based stratified sample — one map pass, no shuffle."""
    return df.sampleBy(strata_col, dict(fractions), seed)
