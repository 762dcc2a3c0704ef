"""Skew-mitigation join operators (SURVEY.md §4 "skewed keys hurt").

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles most
skew at runtime; explicit salting remains necessary when one side must
be replicated (e.g. a hot dimension row joined from a colossal fact
side) or when AQE is unavailable (streaming joins).

salted_join: fact rows get a deterministic salt in [0, n); the other
side is replicated n× with every salt value; the join key becomes
(key, salt) so one hot key spreads over n partitions.  Results are
identical to the unsalted join (verified by property test); cost is
n× replication of the small side — keep n modest (8-32).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str, num_salts: int) -> DataFrame:
    """Deterministic uniform salt derived from an existing column
    (use a high-cardinality column, e.g. the row's primary key)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(from_col)), F.lit(num_salts)).cast("int")
    )


def replicate_salts(df: DataFrame, num_salts: int) -> DataFrame:
    """Cross the (small) side with every salt value."""
    return df.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_salts: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: fact salted, dim replicated.

    `salt_from` defaults to the fact key itself — good enough when the
    VALUES are hot but distinct (classic power-law key); pass a unique
    row id instead when a single key value dominates (hash of the key
    alone would put the whole hot key in one salt bucket again).
    """
    salted_fact = with_salt(fact, salt_from or fact_key, num_salts)
    replicated_dim = replicate_salts(dim, num_salts)
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["__salt"] == replicated_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")
