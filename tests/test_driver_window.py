"""Rotation-policy regression guards (round-3 verdict ask #3).

The driver banks correctness rows only for the FIRST 50 registered
queries, and banks NOTHING for rows-only entries — so the window
must contain exactly 50 existing, oracle-bearing queries.  Round 3
lost 11 slots to rows-only entries and 3 to canon crashes; these
tests make both mistakes impossible to recommit.
"""

from __future__ import annotations

from ex9_big_data_gal_drimer_spark.plans import ORACLES, QUERIES
from ex9_big_data_gal_drimer_spark.plans import __init__ as _plans  # noqa: F401
from ex9_big_data_gal_drimer_spark.plans import _DRIVER_PRIORITY


def test_priority_names_all_exist():
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"_DRIVER_PRIORITY names unknown queries: {missing}"


def test_priority_has_no_duplicates():
    assert len(_DRIVER_PRIORITY) == len(set(_DRIVER_PRIORITY))


def test_window_is_exactly_50_oracle_bearing():
    """Driver slots are scarce: the priority list must be EXACTLY the
    50-slot window (a 51st entry would look seated but never bank a
    row), and all 50 must be oracle-bearing (the driver records
    err='no_oracle' + null rows for anything else)."""
    assert len(_DRIVER_PRIORITY) == 50, (
        f"priority list has {len(_DRIVER_PRIORITY)} entries; the driver "
        "checks exactly 50 — extras silently never bank a row"
    )
    window = list(QUERIES)[:50]
    assert window == _DRIVER_PRIORITY
    rows_only = [n for n in window if n not in ORACLES]
    assert not rows_only, f"rows-only queries waste driver slots: {rows_only}"


def test_every_oracle_key_is_registered():
    dangling = [n for n in ORACLES if n not in QUERIES]
    assert not dangling, f"oracles without queries: {dangling}"


def test_vintage_verdict_boundaries():
    """The vintage gate's exact boundary semantics (round-7 review
    finding): an age-max_age row is LEGAL while unseated (the rotation
    plan's oldest allowed vintage), age max_age+1 unseated is stale,
    seating always exempts, and a never-banked query fails only when
    unseated."""
    import sys

    sys.path.insert(0, "tools")
    from preflight import vintage_verdict

    oracles = ["fresh", "edge", "over", "over_seated", "new", "new_seated"]
    window = {"over_seated", "new_seated"}
    banks = {"fresh": 8, "edge": 4, "over": 3, "over_seated": 3}
    unbanked, stale = vintage_verdict(oracles, window, banks, latest=8, max_age=4)
    assert unbanked == ["new"]  # new_seated exempt via the window
    assert stale == [("over", 3)]  # age 5 > 4; edge (age 4) still legal
    # one round later with nothing reseated, the edge row goes stale too
    unbanked, stale = vintage_verdict(oracles, window, banks, latest=9, max_age=4)
    assert ("edge", 4) in stale and ("over", 3) in stale
