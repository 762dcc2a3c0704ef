"""Deterministic hotels-domain CSV fixture (FIXTURES.md §1).

The reference engine's six queries run on a wide denormalized hotels
CSV (reference main.py:18-159; 16 columns, multi-line quoted
descriptions, empty-string/NULL mixes, a rating word outside the CASE
map).  The driver's testdata has no hotels table, so the repo ships a
seeded fixture at ``data/hotels.csv`` — regenerable bit-for-bit with
:func:`make_hotels_csv` — letting the original-domain queries register
in the driver correctness gate (round-2 verdict ask #5) instead of
living only in local tests.

DuckDB oracle SQL for the same file comes from
:func:`plans.queries_hotels.build_hotel_oracles` so the driver gate
and the local parity test share one SQL source.
"""

from __future__ import annotations

import csv
import random
from pathlib import Path

#: Committed fixture location (repo-root /data/hotels.csv), resolved
#: relative to the package so cwd never matters.
FIXTURE_PATH = Path(__file__).resolve().parents[2] / "data" / "hotels.csv"

COUNTRIES = [
    ("AL", "Albania"), ("IT", "Italy"), ("FR", "France"), ("DE", "Germany"),
    ("ES", "Spain"), ("GB", "UnitedKingdom"), ("US", "UnitedStates"),
    ("JP", "Japan"), ("BR", "Brazil"), ("IN", "India"), ("SG", "Singapore"),
    ("MA", "Morocco"),
]
#: 'All' modal (it is filtered/special-cased, reference main.py:31,60);
#: 'Luxury' = unknown word → NULL from the CASE map (main.py:23-29).
RATINGS = ["All"] * 10 + ["ThreeStar"] * 6 + ["FourStar"] * 4 + [
    "TwoStar"
] * 2 + ["FiveStar"] * 4 + ["OneStar", "Luxury"]
ATTRACTION_POOL = ["Museum", "Beach", "Old Town", "Castle", "Park", "Market",
                   "Cathedral", "Harbor"]

COLUMNS = ["countyCode", "countyName", "cityCode", "cityName", "HotelCode",
           "HotelName", "HotelRating", "Address", "Attractions", "Description",
           "FaxNumber", "HotelFacilities", "Map", "PhoneNumber", "PinCode",
           "HotelWebsiteUrl"]


def make_hotels_csv(path: str, n: int = 400, seed: int = 42) -> None:
    """Write the seeded fixture: multi-line quoted descriptions (forces
    multiLine CSV reading), ~10 % duplicate HotelCodes (COUNT(DISTINCT)
    ≠ COUNT(*)), empty-string cities/attractions, mixed-case 'booking'
    URLs, and NULL-able phone/fax/pin columns."""
    rng = random.Random(seed)
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh, quoting=csv.QUOTE_MINIMAL)
        w.writerow(COLUMNS)
        for i in range(n):
            code, name = rng.choice(COUNTRIES)
            city_idx = rng.randint(0, 3)
            city = "" if rng.random() < 0.02 else f"{name}City{city_idx}"
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
                token = rng.choice(
                    ["Booking", "BOOKING", "booking", "hotels", "expedia"]
                )
                url = f"https://www.{token}.example.com/h{i}"
            w.writerow([
                code, name, 600000 + city_idx, city, hotel_code,
                f"Hotel {name} {i}", rating, f"{i} Main St", attractions,
                description,
                "" if rng.random() < 0.6 else f"+1-555-{i:04d}",
                "WiFi Pool Parking",
                "" if rng.random() < 0.05
                else f"{rng.uniform(-60, 60):.5f}|{rng.uniform(-180, 180):.5f}",
                "" if rng.random() < 0.2 else f"+1-666-{i:04d}",
                "" if rng.random() < 0.1 else f"{rng.randint(10000, 99999)}",
                url if url is not None else "",
            ])


def duckdb_read_csv(path: str | Path) -> str:
    """DuckDB relation text reading the fixture with the exact option
    set the Spark source mirrors (typed columns, ignore_errors ≈
    DROPMALFORMED, doubled-quote escapes)."""
    return (
        f"read_csv('{path}', header=true, ignore_errors=true, "
        "quote='\"', escape='\"', "
        "columns={'countyCode':'VARCHAR','countyName':'VARCHAR',"
        "'cityCode':'BIGINT','cityName':'VARCHAR',"
        "'HotelCode':'BIGINT','HotelName':'VARCHAR',"
        "'HotelRating':'VARCHAR','Address':'VARCHAR',"
        "'Attractions':'VARCHAR','Description':'VARCHAR',"
        "'FaxNumber':'VARCHAR','HotelFacilities':'VARCHAR',"
        "'Map':'VARCHAR','PhoneNumber':'VARCHAR',"
        "'PinCode':'VARCHAR','HotelWebsiteUrl':'VARCHAR'})"
    )
