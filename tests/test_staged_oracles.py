"""Differential tests for STAGED oracles (registry.STAGED_ORACLES):
queries whose oracle SQL is written and verified but not yet
driver-registered because the round's 50-slot window is full of
mandatory vintage re-verifies (plans/queries_analytics6.py module
docstring).  Runs the EXACT comparison test_oracle_parity.py runs for
registered oracles, so promotion (``staged_oracle=`` → ``oracle=``)
changes which harness checks the pair, never the semantics.
"""

from __future__ import annotations

import pytest

from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.registry import ORACLES, STAGED_ORACLES

from conftest import SF_DIR
from test_oracle_parity import _approx_equal, _normalize


@pytest.mark.parametrize("name", sorted(STAGED_ORACLES))
def test_staged_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(STAGED_ORACLES[name])
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


def test_staged_is_disjoint_from_registered():
    """A query is staged XOR registered — promotion must MOVE the SQL."""
    assert not set(STAGED_ORACLES) & set(ORACLES)
    assert set(STAGED_ORACLES) <= set(QUERIES)
