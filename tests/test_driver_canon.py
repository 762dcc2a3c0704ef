"""Driver-canon compatibility gate (round-3 verdict asks #1/#2).

The driver's correctness harness canonicalizes every executed result
through pandas (sort → Categorical → factorize), which raises
``TypeError: unhashable type`` on ARRAY/MAP/STRUCT cells.  Round 3
lost three window slots to that crash.  Two defenses here:

1. ``driver_canon`` in tools/preflight.py now replicates the
   list-intolerant pandas path — regression-tested to go red on an
   array-returning result (the old ``str(v)`` keys silently passed).
2. A registry-wide schema sweep: NO registered query may return a
   non-atomic column type.  Schema derivation is lazy (no execution),
   so the sweep is cheap even over the full registry.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import sys

sys.path.insert(0, ".")
from tools.preflight import driver_canon  # noqa: E402

from ex9_big_data_gal_drimer_spark.plans import QUERIES  # noqa: E402

from conftest import SF_DIR  # noqa: E402

#: Queries whose plan construction requires executor work (iterative
#: fixpoints, layout/sketch writes, streaming checkpoints) — their
#: output schemas are pinned by their own dedicated tests instead of
#: this sweep, which must stay execution-free.  Single source of
#: truth: the registry's ITERATIVE_CONSTRUCTION set (the same list
#: bench.py and test_plan_audit.py key off), not a hand-copied twin.
from ex9_big_data_gal_drimer_spark.plans.registry import (  # noqa: E402
    ITERATIVE_CONSTRUCTION as _CONSTRUCTION_EXECUTES,
)


def test_driver_canon_rejects_array_columns():
    """The crash the round-3 driver hit must now reproduce locally."""
    with pytest.raises(TypeError):
        driver_canon(["k", "segs"], [(1, ["a", "b"]), (2, ["c"])])


def test_driver_canon_rejects_map_columns():
    with pytest.raises(TypeError):
        driver_canon(["k", "m"], [(1, {"a": 1})])


def test_driver_canon_atomic_ok():
    import math

    out = driver_canon(["b", "a"], [(2, "y"), (1, "x"), (None, "z")])
    # column-name sort puts 'a' first; pandas coerces the numeric
    # column's None to NaN (which _values_equal treats as NULL)
    assert [r[0] for r in out] == ["x", "y", "z"]
    assert out[0][1] == 1 and out[1][1] == 2 and math.isnan(out[2][1])


@pytest.mark.parametrize(
    "name", sorted(n for n in QUERIES if n not in _CONSTRUCTION_EXECUTES)
)
def test_registry_schema_is_atomic(spark, name):
    """Every driver-facing query must return only atomic column types —
    the driver's pandas canonicalizer cannot hash ARRAY/MAP/STRUCT."""
    df = QUERIES[name](spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name} returns non-atomic columns {bad} — driver canon crash"
