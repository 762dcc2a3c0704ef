"""Unit tests for warehouse-maintenance operators: CDC merge routing
and SCD2 interval invariants (the differential oracle tests in
test_oracle_parity cover the registered query forms end-to-end)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.operators.merge import merge_apply, scd2_intervals


def _merge_fixture(spark):
    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "k LONG, v DOUBLE"
    )
    changes = spark.createDataFrame(
        [
            (2, "U", 99.0),   # matched update
            (3, "D", None),   # matched delete
            (5, "I", 55.0),   # unmatched insert
            (6, "U", 66.0),   # unmatched upsert -> insert
            (7, "D", None),   # ghost delete -> no-op
        ],
        "k LONG, op STRING, nv DOUBLE",
    )
    return merge_apply(
        base,
        changes,
        key="k",
        set_cols={"v": F.col("c.nv")},
        insert_cols={"v": F.col("c.nv")},
    )


def test_merge_routes_every_branch(spark):
    out = {r["k"]: (r["v"], r["row_status"]) for r in _merge_fixture(spark).collect()}
    assert out == {
        1: (10.0, "kept"),        # untouched base row
        2: (99.0, "updated"),     # payload replaced
        # 3 deleted
        4: (40.0, "kept"),
        5: (55.0, "inserted"),
        6: (66.0, "inserted"),    # 'U' on absent key upserts
        # 7 ghost delete produces nothing
    }


def test_merge_is_idempotent_for_upserts(spark):
    """Re-applying the same non-delete change set must be a no-op on
    values (MERGE's logical idempotence for deterministic updates)."""
    first = _merge_fixture(spark).select("k", "v")
    changes = spark.createDataFrame(
        [(2, "U", 99.0), (5, "I", 55.0), (6, "U", 66.0)],
        "k LONG, op STRING, nv DOUBLE",
    )
    second = merge_apply(
        first,
        changes,
        key="k",
        set_cols={"v": F.col("c.nv")},
        insert_cols={"v": F.col("c.nv")},
    ).select("k", "v")
    assert sorted(map(tuple, first.collect())) == sorted(
        map(tuple, second.collect())
    )


def _scd2_fixture(spark):
    rows = [
        # key 1: A A B A  -> 3 intervals (consecutive dupes collapse)
        (1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "A"),
        # key 2: constant -> 1 open interval
        (2, 1, "X"), (2, 2, "X"),
    ]
    return scd2_intervals(
        spark.createDataFrame(rows, "k LONG, ts LONG, val STRING"),
        key="k",
        ts_col="ts",
        value_col="val",
        tiebreak_col="ts",
    )


def test_scd2_collapses_runs_and_closes_intervals(spark):
    got = sorted(map(tuple, _scd2_fixture(spark).collect()))
    assert got == [
        (1, "A", 1, 3),
        (1, "A", 4, None),
        (1, "B", 3, 4),
        (2, "X", 1, None),
    ]


def test_scd2_intervals_partition_the_timeline(spark):
    """Per key: exactly one open interval, and each closed interval's
    valid_to equals the chronologically next interval's valid_from
    (no gaps, no overlaps)."""
    by_key: dict = {}
    for r in _scd2_fixture(spark).collect():
        by_key.setdefault(r["k"], []).append((r["valid_from"], r["valid_to"]))
    for iv in by_key.values():
        iv.sort()
        assert sum(1 for _, to in iv if to is None) == 1
        for (_, to), (nxt_from, _) in zip(iv, iv[1:]):
            assert to == nxt_from


def test_scd2_property_random_streams(spark):
    """Property: scd2_intervals on randomized per-key value streams
    equals an independent Python run-length reference (hypothesis)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    stream = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # key
            st.sampled_from(["A", "B", "C"]),          # value
        ),
        min_size=0,
        max_size=20,
    )

    def reference(rows):
        # rows arrive as (key, value) in ts order 0..n-1 per insertion
        per_key: dict = {}
        for ts, (k, v) in enumerate(rows):
            per_key.setdefault(k, []).append((ts, v))
        out = []
        for k, seq in per_key.items():
            starts = [
                (ts, v)
                for i, (ts, v) in enumerate(seq)
                if i == 0 or seq[i - 1][1] != v
            ]
            for i, (ts, v) in enumerate(starts):
                valid_to = starts[i + 1][0] if i + 1 < len(starts) else None
                out.append((k, v, ts, valid_to))
        return sorted(out)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows=stream)
    def check(rows):
        from ex9_big_data_gal_drimer_spark.operators.merge import (
            scd2_intervals,
        )

        df = spark.createDataFrame(
            [(k, ts, v) for ts, (k, v) in enumerate(rows)] or [(None,) * 3],
            "k LONG, ts LONG, val STRING",
        ).filter(F.col("k").isNotNull())
        got = sorted(
            map(
                tuple,
                scd2_intervals(
                    df, key="k", ts_col="ts", value_col="val",
                    tiebreak_col="ts",
                ).collect(),
            )
        )
        assert got == reference(rows)

    check()


def test_diff_then_merge_roundtrip_property(spark):
    """The replication law: merge_apply(old, snapshot_diff(old, new))
    must reproduce `new` exactly, over randomized snapshot pairs
    (hypothesis) — diff and merge are inverse halves."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ex9_big_data_gal_drimer_spark.operators.merge import snapshot_diff

    snap = st.dictionaries(
        st.integers(min_value=0, max_value=12),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        max_size=8,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(old=snap, new=snap)
    def check(old, new):
        old_df = spark.createDataFrame(
            [(k, v) for k, v in old.items()] or [(None, None)],
            "k LONG, v DOUBLE",
        ).filter(F.col("k").isNotNull())
        new_df = spark.createDataFrame(
            [(k, v) for k, v in new.items()] or [(None, None)],
            "k LONG, v DOUBLE",
        ).filter(F.col("k").isNotNull())
        feed = snapshot_diff(old_df, new_df, key="k", payload_cols=["v"])
        replayed = merge_apply(
            old_df,
            feed,
            key="k",
            set_cols={"v": F.col("c.v")},
            insert_cols={"v": F.col("c.v")},
        ).select("k", "v")
        assert {r["k"]: r["v"] for r in replayed.collect()} == new

    check()
