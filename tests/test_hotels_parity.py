"""Reference-parity on the hotels domain (SURVEY.md §5).

Generates a FIXTURES.md §1 hotels CSV (multi-line quoted descriptions,
empty/NULL mixes, rating-word distribution incl. an unknown word),
reads it through the engine's error-tolerant CSV source, and checks
each hotels-domain query against DuckDB running equivalent SQL on the
*identical* file.
"""

from __future__ import annotations

import csv
import math
import random

import duckdb
import pytest

from ex9_big_data_gal_drimer_spark.plans.hotels import HOTEL_QUERIES
from ex9_big_data_gal_drimer_spark.sources.csv import (
    parse_map_column,
    read_hotels_csv,
)

COUNTRIES = [
    ("AL", "Albania"), ("IT", "Italy"), ("FR", "France"), ("DE", "Germany"),
    ("ES", "Spain"), ("GB", "UnitedKingdom"), ("US", "UnitedStates"),
    ("JP", "Japan"), ("BR", "Brazil"), ("IN", "India"), ("SG", "Singapore"),
    ("MA", "Morocco"),
]
RATINGS = ["All"] * 10 + ["ThreeStar"] * 6 + ["FourStar"] * 4 + [
    "TwoStar"
] * 2 + ["FiveStar"] * 4 + ["OneStar", "Luxury"]  # 'Luxury' = unknown word → NULL
ATTRACTION_POOL = ["Museum", "Beach", "Old Town", "Castle", "Park", "Market",
                   "Cathedral", "Harbor"]


def _make_hotels_csv(path: str, n: int = 400, seed: int = 42) -> None:
    rng = random.Random(seed)
    cols = ["countyCode", "countyName", "cityCode", "cityName", "HotelCode",
            "HotelName", "HotelRating", "Address", "Attractions", "Description",
            "FaxNumber", "HotelFacilities", "Map", "PhoneNumber", "PinCode",
            "HotelWebsiteUrl"]
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh, quoting=csv.QUOTE_MINIMAL)
        w.writerow(cols)
        for i in range(n):
            code, name = rng.choice(COUNTRIES)
            city_idx = rng.randint(0, 3)
            city = "" if rng.random() < 0.02 else f"{name}City{city_idx}"
            # ~10% duplicate hotel codes so COUNT(DISTINCT) != COUNT(*)
            hotel_code = 1000000 + (rng.randint(0, int(n * 0.9)))
            rating = rng.choice(RATINGS)
            attractions = (
                ""
                if rng.random() < 0.5
                else ", ".join(rng.sample(ATTRACTION_POOL, rng.randint(1, 5)))
            )
            description = (
                f'The "{name}" hotel {i}.\nSecond line of description.\n'
                f"Third, with comma."
            )
            url = None
            if rng.random() < 0.75:
                token = rng.choice(["Booking", "BOOKING", "booking", "hotels", "expedia"])
                url = f"https://www.{token}.example.com/h{i}"
            row = [
                code, name, 600000 + city_idx, city, hotel_code,
                f"Hotel {name} {i}", rating, f"{i} Main St", attractions,
                description,
                "" if rng.random() < 0.6 else f"+1-555-{i:04d}",
                "WiFi Pool Parking",
                "" if rng.random() < 0.05 else f"{rng.uniform(-60, 60):.5f}|{rng.uniform(-180, 180):.5f}",
                "" if rng.random() < 0.2 else f"+1-666-{i:04d}",
                "" if rng.random() < 0.1 else f"{rng.randint(10000, 99999)}",
                url if url is not None else "",
            ]
            w.writerow(row)


HOTEL_ORACLE_SQL = {
    "hotels_q1": """
        WITH county AS (
            SELECT countyName,
                   COUNT(DISTINCT HotelCode) AS num_hotels,
                   ROUND(AVG(CASE WHEN HotelRating='OneStar' THEN 1
                                  WHEN HotelRating='TwoStar' THEN 2
                                  WHEN HotelRating='ThreeStar' THEN 3
                                  WHEN HotelRating='FourStar' THEN 4
                                  WHEN HotelRating='FiveStar' THEN 5 END), 2) AS avg_rating
            FROM hotels WHERE HotelRating NOT IN ('All')
            GROUP BY countyName
        ), total AS (SELECT CAST(SUM(num_hotels) AS BIGINT) AS world_total_hotels FROM county)
        SELECT countyName, num_hotels, avg_rating,
               ROUND(num_hotels * 100.0 / world_total_hotels, 2) AS pct_of_world
        FROM county, total ORDER BY num_hotels DESC, countyName
    """,
    "hotels_q2": """
        WITH county AS (
            SELECT countyName, COUNT(DISTINCT HotelCode) AS num_luxury_hotels
            FROM hotels WHERE HotelRating IN ('FiveStar', 'All')
            GROUP BY countyName
        ), total AS (SELECT CAST(SUM(num_luxury_hotels) AS BIGINT)
                     AS total_luxury_hotels_worldwide FROM county)
        SELECT countyName, num_luxury_hotels,
               ROUND(num_luxury_hotels * 100.0 / total_luxury_hotels_worldwide, 2)
                   AS pct_of_world_luxury,
               total_luxury_hotels_worldwide
        FROM county, total ORDER BY num_luxury_hotels DESC, countyName
    """,
    "hotels_q3": """
        SELECT COUNT(DISTINCT CASE WHEN LOWER(HotelWebsiteUrl) LIKE '%booking%'
                                   THEN HotelCode END) AS hotels_with_booking,
               COUNT(DISTINCT HotelCode) AS total_hotels,
               COUNT(DISTINCT CASE WHEN HotelWebsiteUrl IS NOT NULL
                                   THEN HotelCode END) AS hotels_with_urls,
               ROUND(COUNT(DISTINCT CASE WHEN LOWER(HotelWebsiteUrl) LIKE '%booking%'
                                         THEN HotelCode END) * 100.0
                     / COUNT(DISTINCT HotelCode), 2) AS pct_of_all_hotels,
               ROUND(COUNT(DISTINCT CASE WHEN LOWER(HotelWebsiteUrl) LIKE '%booking%'
                                         THEN HotelCode END) * 100.0
                     / COUNT(DISTINCT CASE WHEN HotelWebsiteUrl IS NOT NULL
                                           THEN HotelCode END), 2)
                   AS pct_of_hotels_with_urls
        FROM hotels
    """,
    "hotels_q4": """
        WITH county AS (
            SELECT countyName, COUNT(DISTINCT HotelCode) AS num_hotels
            FROM hotels GROUP BY countyName
        )
        SELECT countyName, num_hotels,
               RANK() OVER (ORDER BY num_hotels DESC) AS rank_in_world,
               ROUND(100.0 * num_hotels /
                     FIRST_VALUE(num_hotels) OVER (ORDER BY num_hotels DESC), 2)
                   AS pct_of_top
        FROM county ORDER BY rank_in_world, countyName
    """,
    "hotels_q5": """
        WITH base AS (
            SELECT countyName, HotelName,
                   LENGTH(Attractions) - LENGTH(REPLACE(Attractions, ',', '')) + 1
                       AS num_attractions
            FROM hotels
            WHERE HotelRating = 'FiveStar' AND TRIM(Attractions) != ''
        )
        SELECT countyName,
               COUNT(DISTINCT HotelName) AS num_five_star_hotels,
               CAST(SUM(num_attractions) AS BIGINT) AS total_attractions,
               ROUND(AVG(num_attractions), 2) AS avg_attractions_per_hotel
        FROM base GROUP BY countyName
        ORDER BY total_attractions DESC, countyName LIMIT 10
    """,
    "hotels_q6": """
        WITH county AS (
            SELECT countyName,
                   COUNT(DISTINCT HotelCode) AS num_hotels,
                   COUNT(DISTINCT cityName) AS total_cities
            FROM hotels WHERE TRIM(cityName) != ''
            GROUP BY countyName
        )
        SELECT countyName, num_hotels, total_cities,
               ROUND(1.0 * num_hotels / total_cities, 2) AS hotels_per_city
        FROM county WHERE total_cities > 0
        ORDER BY hotels_per_city DESC, countyName LIMIT 10
    """,
}


@pytest.fixture(scope="module")
def hotels_env(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hotels") / "hotels.csv")
    _make_hotels_csv(path)
    sdf = read_hotels_csv(spark, path)
    con = duckdb.connect()
    con.execute(f"""
        CREATE VIEW hotels AS SELECT * FROM read_csv('{path}',
            header=true, ignore_errors=true, quote='"', escape='"',
            columns={{'countyCode':'VARCHAR','countyName':'VARCHAR',
                      'cityCode':'BIGINT','cityName':'VARCHAR',
                      'HotelCode':'BIGINT','HotelName':'VARCHAR',
                      'HotelRating':'VARCHAR','Address':'VARCHAR',
                      'Attractions':'VARCHAR','Description':'VARCHAR',
                      'FaxNumber':'VARCHAR','HotelFacilities':'VARCHAR',
                      'Map':'VARCHAR','PhoneNumber':'VARCHAR',
                      'PinCode':'VARCHAR','HotelWebsiteUrl':'VARCHAR'}})
    """)
    yield sdf, con
    con.close()


def test_csv_read_rowcount(hotels_env):
    sdf, con = hotels_env
    assert sdf.count() == con.execute("SELECT COUNT(*) FROM hotels").fetchone()[0] == 400
    # multi-line descriptions survived quoting
    assert sdf.filter(sdf.Description.contains("\n")).count() == 400


@pytest.mark.parametrize("name", sorted(HOTEL_QUERIES))
def test_hotels_query_parity(name, hotels_env):
    sdf, con = hotels_env
    spark_rows = [tuple(r) for r in HOTEL_QUERIES[name](sdf).collect()]
    duck_rows = con.execute(HOTEL_ORACLE_SQL[name]).fetchall()
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
    sdf, _ = hotels_env
    parsed = parse_map_column(sdf)
    row = parsed.filter(parsed.coords.isNotNull()).select("coords").first()
    assert -60 <= row.coords.lat <= 60
    assert -180 <= row.coords.lon <= 180
