"""Property-based MERGE semantics: merge_apply vs an independent
pure-Python reference over randomized bases and change sets
(hypothesis).  Spark executes per example, so the example budget is
small but each covers many keys/branches at once."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.operators.merge import merge_apply

KEYS = st.integers(min_value=0, max_value=14)

base_strategy = st.dictionaries(KEYS, st.floats(
    min_value=-1000, max_value=1000, allow_nan=False), max_size=10)
changes_strategy = st.dictionaries(
    KEYS,
    st.tuples(
        st.sampled_from(["U", "I", "D"]),
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
    ),
    max_size=10,
)


def reference_merge(base: dict, changes: dict) -> dict:
    out = dict(base)
    for key, (op, nv) in changes.items():
        if op == "D":
            out.pop(key, None)  # delete; absent key -> no-op
        else:  # 'U'/'I' both upsert
            out[key] = nv
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(base=base_strategy, changes=changes_strategy)
def test_merge_apply_matches_reference(spark, base, changes):
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "k LONG, v DOUBLE"
    ).filter(F.col("k").isNotNull())
    chg_df = spark.createDataFrame(
        [(k, op, nv) for k, (op, nv) in changes.items()] or [(None, None, None)],
        "k LONG, op STRING, nv DOUBLE",
    ).filter(F.col("k").isNotNull())
    got = {
        r["k"]: r["v"]
        for r in merge_apply(
            base_df,
            chg_df,
            key="k",
            set_cols={"v": F.col("c.nv")},
            insert_cols={"v": F.col("c.nv")},
        ).collect()
    }
    assert got == reference_merge(base, changes)
