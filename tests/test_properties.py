"""Property-based tests (hypothesis) for operator invariants.

Each property runs Spark once over a hypothesis-generated local
DataFrame — the generators are kept small so the suite stays fast, but
the invariants are the ones that must hold at any scale:

- percent_of_total sums to ~100 regardless of grouping,
- exact_dedup partitions the input (group sizes sum to row count),
- both percent-of-total physical modes agree,
- seeded sampling is a deterministic function of (data, seed).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.operators.dedup import exact_dedup
from ex9_big_data_gal_drimer_spark.operators.relational import percent_of_total
from ex9_big_data_gal_drimer_spark.operators.sampling import seeded_sample_n

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

groups = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=1000),
    ),
    min_size=1,
    max_size=12,
)


@given(rows=groups)
@SLOW
def test_percent_of_total_sums_to_100(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long")
    agg = df.groupBy("k").agg(F.sum("v").cast("long").alias("v"))
    out = percent_of_total(agg, "v", pct_col="pct")
    total_pct = out.agg(F.sum("pct")).first()[0]
    assert abs(total_pct - 100.0) < 0.05 * out.count() + 1e-6


@given(rows=groups)
@SLOW
def test_percent_of_total_modes_agree(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long")
    agg = df.groupBy("k").agg(F.sum("v").cast("long").alias("v"))
    a = sorted(map(tuple, percent_of_total(agg, "v", mode="window").collect()))
    b = sorted(map(tuple, percent_of_total(agg, "v", mode="crossjoin").collect()))
    assert a == b


texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=20), min_size=1, max_size=20
)


@given(docs=texts)
@SLOW
def test_exact_dedup_partitions_input(spark, docs):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups_df = exact_dedup(df)
    assert groups_df.agg(F.sum("n_copies")).first()[0] == len(rows)
    keep_ids = [r.keep_doc_id for r in groups_df.collect()]
    assert len(keep_ids) == len(set(keep_ids))


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@SLOW
def test_seeded_sample_deterministic(spark, seed):
    df = spark.range(200).withColumnRenamed("id", "k")
    a = sorted(r.k for r in seeded_sample_n(df, 50, seed=seed).collect())
    b = sorted(r.k for r in seeded_sample_n(df, 50, seed=seed).collect())
    assert a == b
    assert len(a) == 50


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@SLOW
def test_sorted_small_equals_orderby(spark, seed):
    """sorted_small (coalesce(1) + within-partition sort) must yield
    the exact sequence a global orderBy yields — it exists to skip the
    range-partitioner sampling job, never to change results."""
    import random

    from ex9_big_data_gal_drimer_spark.operators.relational import sorted_small

    rng = random.Random(seed)
    rows = [(rng.randint(0, 5), rng.randint(-100, 100)) for _ in range(60)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    a = [tuple(r) for r in sorted_small(df, F.desc("v"), "k").collect()]
    b = [tuple(r) for r in df.orderBy(F.desc("v"), "k").collect()]
    assert a == b


# --- PII redaction invariants (operators/privacy.py) ---------------------

pii_texts = st.lists(
    st.tuples(
        st.text(alphabet="abc xyz.", min_size=0, max_size=12),
        st.sampled_from([
            "",
            "bob@example.com",
            "x.y+z@mail-host.org",
            "+1-555-0142",
            "+44 201 7000",
            "not-an-email@",
            "+1-55-01",
        ]),
        st.text(alphabet="abc xyz.", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=10,
)


@given(rows=pii_texts)
@SLOW
def test_redact_pii_is_complete_and_idempotent(spark, rows):
    """After one redaction pass, detection finds nothing (complete),
    and a second pass is a no-op (idempotent) — the two invariants a
    scrub must hold at any corpus size."""
    from ex9_big_data_gal_drimer_spark.operators.privacy import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [(a + " " + m + " " + b,) for a, m, b in rows], "t string"
    )
    once = df.select(redact_pii(F.col("t")).alias("c"))
    n_email, n_phone = pii_counts(F.col("c"))
    residual = once.agg(F.sum(n_email + n_phone)).first()[0]
    assert residual == 0
    twice = once.select(redact_pii(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]


@given(rows=pii_texts)
@SLOW
def test_redact_pii_preserves_clean_text(spark, rows):
    """Rows with no PII pass through byte-identical."""
    from ex9_big_data_gal_drimer_spark.operators.privacy import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame([(a,) for a, _, _ in rows], "t string")
    n_email, n_phone = pii_counts(F.col("t"))
    clean = df.filter((n_email + n_phone) == 0)
    out = clean.select("t", redact_pii(F.col("t")).alias("c")).collect()
    assert all(r["t"] == r["c"] for r in out)
