"""Reference-parity on the hotels domain (SURVEY.md §5).

Generates a FIXTURES.md §1 hotels CSV (multi-line quoted descriptions,
empty/NULL mixes, rating-word distribution incl. an unknown word),
reads it through the engine's error-tolerant CSV source, and checks
each hotels-domain query against DuckDB running the reference SQL on
the *identical* file.  The generator and oracle SQL are shared with
the driver-registered hotels_q* queries (plans.queries_hotels), which
run on the committed copy at data/hotels.csv — a determinism test
pins that the committed file IS the seeded generator's output.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from ex9_big_data_gal_drimer_spark.plans.hotels import HOTEL_QUERIES
from ex9_big_data_gal_drimer_spark.plans.queries_hotels import build_hotel_oracles
from ex9_big_data_gal_drimer_spark.sources.csv import (
    parse_map_column,
    read_hotels_csv,
)
from ex9_big_data_gal_drimer_spark.sources.hotels_fixture import (
    FIXTURE_PATH,
    duckdb_read_csv,
    make_hotels_csv,
)


@pytest.fixture(scope="module")
def hotels_env(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hotels") / "hotels.csv")
    make_hotels_csv(path)
    sdf = read_hotels_csv(spark, path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW hotels_csv AS SELECT * FROM {duckdb_read_csv(path)}")
    yield sdf, con, build_hotel_oracles(path)
    con.close()


def test_committed_fixture_is_deterministic(tmp_path):
    """data/hotels.csv must be exactly the seeded generator's output —
    the driver oracle runs against the committed copy."""
    regen = tmp_path / "hotels.csv"
    make_hotels_csv(str(regen))
    assert regen.read_bytes() == FIXTURE_PATH.read_bytes()


def test_csv_read_rowcount(hotels_env):
    sdf, con, _ = hotels_env
    n = con.execute("SELECT COUNT(*) FROM hotels_csv").fetchone()[0]
    assert sdf.count() == n == 400
    # multi-line descriptions survived quoting
    assert sdf.filter(sdf.Description.contains("\n")).count() == 400


@pytest.mark.parametrize("name", sorted(HOTEL_QUERIES))
def test_hotels_query_parity(name, hotels_env):
    sdf, con, oracles = hotels_env
    spark_rows = [tuple(r) for r in HOTEL_QUERIES[name](sdf).collect()]
    duck_rows = con.execute(oracles[name]).fetchall()
    assert len(spark_rows) == len(duck_rows), f"{name} row counts"
    for srow, drow in zip(sorted(map(str, spark_rows)), sorted(map(str, duck_rows))):
        for sv, dv in zip(eval(srow), eval(drow)):
            if isinstance(sv, float) or isinstance(dv, float):
                assert sv is not None and dv is not None and math.isclose(
                    float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-9
                ), f"{name}: {srow} vs {drow}"
            else:
                assert sv == dv, f"{name}: {srow} vs {drow}"


def test_map_column_parse(hotels_env):
    sdf, _, _ = hotels_env
    parsed = parse_map_column(sdf)
    row = parsed.filter(parsed.coords.isNotNull()).select("coords").first()
    assert -60 <= row.coords.lat <= 60
    assert -180 <= row.coords.lon <= 180
