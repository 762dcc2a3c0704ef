"""Differential tests: every registered query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS gate (SURVEY.md §5): row count, column
name set, and order-insensitive value comparison (columns sorted by
name, rows sorted, floats compared with a tight tolerance).
"""

from __future__ import annotations

import datetime
import math

import pytest

from ex9_big_data_gal_drimer_spark.plans import ORACLES, QUERIES

from conftest import SF_DIR


def _normalize(rows, columns):
    """list-of-dicts → column-name-sorted tuples, rows sorted."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(value):
        # Sortable, type-stable representation (floats rounded so sort
        # order can't flip on sub-tolerance noise).
        if value is None:
            return (0, "")
        if isinstance(value, float):
            return (1, f"{value:.6f}")
        if isinstance(value, (int,)):
            return (1, f"{float(value):.6f}")
        if isinstance(value, (datetime.datetime, datetime.date)):
            return (2, value.isoformat())
        return (3, str(value))

    out = [tuple(row[i] for i in order) for row in rows]
    return sorted(out, key=lambda r: tuple(key(v) for v in r))


def _approx_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), "column names diverge"
    assert len(spark_rows) == len(duck_rows), "row counts diverge"

    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    for i, (srow, drow) in enumerate(zip(s_norm, d_norm)):
        for col, (sv, dv) in enumerate(zip(srow, drow)):
            assert _approx_equal(sv, dv), (
                f"{name}: value mismatch row {i} col {sorted(spark_cols)[col]}: "
                f"spark={sv!r} duckdb={dv!r}"
            )


def test_every_query_has_entry():
    """Every registered query is exposed through the driver contract."""
    import __spark_entry__ as e

    assert set(e.queries()) == set(QUERIES)
    assert set(e.oracle_sql()) == set(ORACLES)
    assert set(ORACLES) <= set(QUERIES)
