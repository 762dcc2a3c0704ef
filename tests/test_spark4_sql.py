"""Spark-4 SQL-surface features (plans/queries_spark4.py):
native recursive CTE, SQL UDF/UDTF inlining, SQL scripting.

Value parity for the three registered queries rides on
tests/test_oracle_parity.py (auto-parametrized over ORACLES); this
file pins the FEATURE claims — gap-free recursion, codegen inlining,
scripting control flow — that a value hash alone can't show.
"""

from __future__ import annotations

import datetime

import pytest

from ex9_big_data_gal_drimer_spark.plans import QUERIES

from conftest import SF_DIR


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_recursive_series_is_gap_free(spark):
    """Consecutive months, no holes, endpoints = data min/max."""
    rows = QUERIES["recursive_month_series"](spark, SF_DIR).collect()
    months = [r.order_month for r in rows]
    assert months == sorted(months)

    def nxt(ym: str) -> str:
        d = datetime.date(int(ym[:4]), int(ym[5:7]), 1)
        y, m = (d.year + 1, 1) if d.month == 12 else (d.year, d.month + 1)
        return f"{y:04d}-{m:02d}"

    for a, b in zip(months, months[1:]):
        assert b == nxt(a), f"gap in recursive series: {a} → {b}"
    # zero-filled months carry 0/0.0, never NULL
    assert all(r.n_orders >= 0 and r.total_price is not None for r in rows)


def test_recursive_cte_runs_inside_one_plan(spark):
    """The recursion is plan-native: the physical plan contains the
    UnionLoop recursion operator — no driver-side iteration."""
    df = QUERIES["recursive_month_series"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "UnionLoop" in plan or "Recursi" in plan, plan[:2000]


def test_sql_udf_inlines_into_codegen(spark):
    """The SQL UDF has NO eval boundary: no Python runner, no
    ScalaUDF — the body is expanded as expressions inside the
    aggregate (the whole point of the tier)."""
    df = QUERIES["sql_udf_doc_score"](spark, SF_DIR)
    df.collect()  # finalize the adaptive plan so codegen spans appear
    plan = _physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ScalaUDF" not in plan
    # the expanded body's LEAST survives into the physical aggregate,
    # inside the partial (map-side) HashAggregate
    assert "partial_avg" in plan and "least" in plan.lower()


def test_sql_table_function_with_lateral(spark):
    """SQL UDTF (CREATE FUNCTION … RETURNS TABLE): set-returning SQL
    abstractions usable under LATERAL — the declarative cousin of the
    Python UDTF in operators/udtf_media.py."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION char_ngrams(t STRING, n INT)
        RETURNS TABLE (ngram STRING)
        RETURN SELECT substr(t, pos, n) AS ngram
               FROM (SELECT explode(sequence(1, length(t) - n + 1)) AS pos)
        """
    )
    got = [r.ngram for r in spark.sql("SELECT * FROM char_ngrams('spark', 3)").collect()]
    assert got == ["spa", "par", "ark"]

    lateral = spark.sql(
        """
        SELECT w, g.ngram
        FROM VALUES ('abc'), ('abcd') AS t(w), LATERAL char_ngrams(w, 2) AS g
        """
    ).collect()
    assert sorted((r.w, r.ngram) for r in lateral) == [
        ("abc", "ab"),
        ("abc", "bc"),
        ("abcd", "ab"),
        ("abcd", "bc"),
        ("abcd", "cd"),
    ]


def test_sql_scripting_control_flow(spark):
    """SQL scripting (Spark 4.0 BEGIN/DECLARE/WHILE): procedural
    control flow evaluated by the engine — the migration path for
    stored-procedure-style maintenance jobs."""
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        rows = spark.sql(
            """
            BEGIN
              DECLARE i INT = 1;
              DECLARE acc BIGINT = 0;
              WHILE i <= 100 DO
                SET acc = acc + i;
                SET i = i + 1;
              END WHILE;
              SELECT acc AS total;
            END
            """
        ).collect()
        assert rows[0].total == 5050
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


def test_regression_aggregates_partial(spark):
    """regr_* reduce via partial aggregation (map-side combine):
    two HashAggregate levels around the exchange, no window/sort."""
    df = QUERIES["price_size_regression"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert plan.count("HashAggregate") >= 2
    assert "Window" not in plan
    rows = df.collect()
    assert len(rows) > 0
    # r2 is the square of pearson within rounding noise
    for r in rows:
        if r.r2 is not None and r.pearson_r is not None:
            assert abs(r.r2 - r.pearson_r**2) < 1e-2
