"""Planted-behavior evidence for the embedding-training and
event-analytics operators added late in round 4: hard-negative mining
must flag label noise with a negative margin, and the transition
matrix must recover a known deterministic chain — each with an oracle
differential on the same planted table.
"""

from __future__ import annotations

import datetime

import duckdb

from ex9_big_data_gal_drimer_spark.plans import ORACLES, QUERIES


def _duck_view(sf_dir, name):
    con = duckdb.connect()
    # Spark writes a directory; DuckDB needs the part-file glob
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet/*.parquet'"
    )
    return con


def test_hard_negative_mining_flags_label_noise(spark, tmp_path):
    """Query 0 (label 0) sits next to a label-1 vector and far from
    its own label: the hard negative outranks the positive ⇒ margin
    < 0 — the label-noise signal the operator exists for.  Query 1
    (label 1) is clean ⇒ margin > 0."""
    dim = 64

    def vec(hot, val=1.0):
        v = [0.0] * dim
        for i, x in zip(hot, [val] * len(hot)):
            v[i] = x
        return [float(x) for x in v]

    rows = [
        # query 0: label 0, pointing along axis 0
        (0, vec([0]), 0),
        # query 1: label 1, pointing along axis 8
        (1, vec([8]), 1),
        # corpus: a label-1 vector almost identical to query 0 (noise!)
        (10, vec([0, 1], 1.0), 1),
        # the nearest label-0 vector to query 0 is much farther
        (11, vec([0, 2, 3]), 0),
        # clean label-1 neighbor for query 1
        (12, vec([8, 9]), 1),
        # far label-0 vector (query 1's hard negative)
        (13, vec([40]), 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    got = {r.query_id: r for r in QUERIES["hard_negative_mining"](spark, sf_dir).collect()}
    assert got[0].neg_id == 10 and got[0].margin < 0  # noise detected
    assert got[1].pos_id == 12 and got[1].margin > 0  # clean query

    con = _duck_view(sf_dir, "embeddings")
    want = con.execute(ORACLES["hard_negative_mining"]).fetchall()
    assert sorted(tuple(r) for r in got.values()) == sorted(want)


def test_event_transition_matrix_recovers_planted_chain(spark, tmp_path):
    """One user emits view→click→view→click→purchase: the matrix must
    show view→click with p=1.0 and click→{view, purchase} at 0.5
    each; a second user's error→error self-loop stays isolated."""
    t0 = datetime.datetime(2024, 1, 1)

    def ts(i):
        return t0 + datetime.timedelta(seconds=i)

    rows = [
        (1, ts(0), 1, "view", 0.0, "{}"),
        (2, ts(1), 1, "click", 0.0, "{}"),
        (3, ts(2), 1, "view", 0.0, "{}"),
        (4, ts(3), 1, "click", 0.0, "{}"),
        (5, ts(4), 1, "purchase", 9.0, "{}"),
        (6, ts(0), 2, "error", 0.0, "{}"),
        (7, ts(1), 2, "error", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    got = {
        (r.from_type, r.to_type): r
        for r in QUERIES["event_transition_matrix"](spark, sf_dir).collect()
    }
    assert got[("view", "click")].n == 2 and got[("view", "click")].p == 1.0
    assert got[("click", "view")].p == 0.5
    assert got[("click", "purchase")].p == 0.5
    assert got[("error", "error")].n == 1 and got[("error", "error")].p == 1.0
    # no cross-user transition (user 1's purchase never precedes user 2's error)
    assert ("purchase", "error") not in got

    con = _duck_view(sf_dir, "events")
    want = con.execute(ORACLES["event_transition_matrix"]).fetchall()
    assert sorted(tuple(r) for r in got.values()) == sorted(want)


def test_transition_probabilities_sum_to_one(spark):
    """Invariant on the real driver corpus: each from_type's outgoing
    probabilities must sum to ~1.0 (4-decimal rounding tolerance) and
    counts must equal |events| - |users with >=1 event| (every event
    except each user's last contributes exactly one transition)."""
    import os


    from ex9_big_data_gal_drimer_spark.catalog import table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = QUERIES["event_transition_matrix"](spark, sf_dir).collect()
    by_from = {}
    total_n = 0
    for r in rows:
        by_from.setdefault(r.from_type, 0.0)
        by_from[r.from_type] += r.p
        total_n += r.n
    for from_type, s in by_from.items():
        assert abs(s - 1.0) < 0.005, (from_type, s)
    ev = table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_n == n_events - n_users
