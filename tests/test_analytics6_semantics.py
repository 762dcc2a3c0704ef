"""Edge-case semantics pins for the staged round-11 rotation queries
(plans/queries_analytics6.py) on CRAFTED parquet — cases the sf-data
oracle differential (tests/test_staged_oracles.py) exercises only
incidentally: dominance tie rules and duplicate points for the
skyline; end-exclusive concurrency, zero-length sessions, and
midnight-spanning carry-in for the sweep line; plus a vacuity guard
proving the join-IVM differential really covers a restated overlap.

The crafted tables are written into a tmp dir shaped like an sf_dir,
so the REGISTERED plan runs unmodified through catalog.table.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.queries_analytics6 import (
    _VIEW_DELTA,
    _VIEW_SETTLED,
)

from conftest import SF_DIR


def test_skyline_dominance_tie_rules(spark, tmp_path):
    """Same-price smaller-size and same-size pricier points are
    dominated; exact duplicate points survive as ONE grouped row with
    their multiplicity; a brand's single point is its whole skyline."""
    rows = [
        # pk, brand, price, size
        (1, "B", 1.00, 5),   # skyline: cheapest price
        (2, "B", 1.00, 3),   # dominated: same price, smaller size
        (3, "B", 2.00, 5),   # dominated: same size, pricier
        (4, "B", 2.00, 7),   # skyline (duplicate point ...
        (5, "B", 2.00, 7),   # ... both survive, grouped, n_parts=2)
        (6, "B", 3.00, 7),   # dominated: same size as (2.00, 7), pricier
        (7, "B", 3.00, 9),   # skyline: biggest size
        (8, "C", 5.00, 1),   # skyline: only point of its brand
    ]
    table = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "p_brand": pa.array([r[1] for r in rows], pa.string()),
            "p_retailprice": pa.array([r[2] for r in rows], pa.float64()),
            "p_size": pa.array([r[3] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "part.parquet"))
    got = [
        tuple(r)
        for r in QUERIES["skyline_parts_pareto"](spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("B", 1.00, 5, 1, 1),
        ("B", 2.00, 7, 2, 4),
        ("B", 3.00, 9, 1, 7),
        ("C", 5.00, 1, 1, 8),
    ]


def test_peak_concurrency_tie_rules_and_carry(spark, tmp_path):
    """End-exclusive ties (-1 sorts before +1 at equal ts), zero-length
    sessions never counting toward a peak, and a midnight-spanning
    session whose carried-in concurrency is REPORTED on the next day
    (pre-event level of the end row — round-10 ADVICE fix)."""
    d1 = dt.datetime(2024, 3, 1)
    ev = [
        # user, ts — 30-min gap sessionization gives one session per
        # user here except u5, whose 15-min midnight gap chains into
        # ONE session spanning into 2024-03-02.
        (1, d1 + dt.timedelta(minutes=0)),
        (1, d1 + dt.timedelta(minutes=10)),   # u1 session [00:00, 00:10]
        (4, d1 + dt.timedelta(minutes=2)),
        (4, d1 + dt.timedelta(minutes=8)),    # u4 session [00:02, 00:08]
        (2, d1 + dt.timedelta(minutes=5)),    # u2 zero-length at 00:05
        (3, d1 + dt.timedelta(minutes=10)),   # u3 zero-length at 00:10
        (5, d1 + dt.timedelta(hours=23, minutes=50)),
        (5, d1 + dt.timedelta(hours=24, minutes=5)),  # u5 spans midnight
    ]
    table = pa.table(
        {
            "event_id": pa.array(range(len(ev)), pa.int64()),
            "ts": pa.array([t for _, t in ev], pa.timestamp("us")),
            "user_id": pa.array([u for u, _ in ev], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    got = [
        tuple(r)
        for r in QUERIES["peak_concurrent_sessions"](spark, str(tmp_path)).collect()
    ]
    # Day 1: peak 2 (u1+u4 overlap; u2's zero-length -1/+1 and u3's
    # start-at-u1's-end never raise it past 2 — a -1's pre-event level
    # run-LEAST(delta,0) re-adds only the ending session itself, and a
    # zero-length session's -1 sorts before its +1 so its pre-event
    # level never exceeds the surrounding concurrency).  Day 2 holds
    # only u5's session END: carry-in +1, and the pre-event level of
    # that -1 row reports the carried-in concurrency 1 (round-10
    # ADVICE fix — the old endpoint-sampled convention reported 0 for
    # carry-only days).
    assert got == [
        (dt.date(2024, 3, 1), 2, 5),
        (dt.date(2024, 3, 2), 1, 0),
    ]


def test_join_ivm_restated_overlap_is_nonempty(duck):
    """The join-IVM differential proves upsert-vs-append only if the
    restated slice [_VIEW_DELTA, _VIEW_SETTLED) actually contains
    orders at the test SF — a calendar drift in the generator would
    silently turn the merge test vacuous."""
    n = duck.execute(
        f"""
        SELECT COUNT(*) FROM orders
        WHERE o_orderdate >= TIMESTAMP '{_VIEW_DELTA} 00:00:00'
          AND o_orderdate <  TIMESTAMP '{_VIEW_SETTLED} 00:00:00'
        """
    ).fetchone()[0]
    assert n > 0, f"restated year empty at {SF_DIR} — merge test is vacuous"
    # ... and the delta batch also contains NEW (post-settled) orders,
    # so both MERGE arms (update + insert) are exercised.
    n_new = duck.execute(
        f"SELECT COUNT(*) FROM orders WHERE o_orderdate >= TIMESTAMP '{_VIEW_SETTLED} 00:00:00'"
    ).fetchone()[0]
    assert n_new > 0
