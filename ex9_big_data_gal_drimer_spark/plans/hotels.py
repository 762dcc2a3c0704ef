"""The six reference queries in their ORIGINAL hotels-domain form.

These operate on a hotels DataFrame with the reference's 16-column
schema (sources.csv.HOTELS_SCHEMA) and reproduce the exact semantics
of reference main.py:18-159 — including the NULL-rating CASE map, the
`IN ('FiveStar','All')` quirk of q2 (main.py:60), and the
count-of-NAMES (not codes) in q5 (main.py:122).

They are exercised by tests/test_hotels_parity.py against DuckDB on an
identical synthetic CSV (FIXTURES.md §1); they're not in the driver
registry because the driver's testdata has no hotels table — the same
operator shapes are registered there via the star-schema recasts
(queries_parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import case_map, token_count
from ..operators.relational import percent_of_total

#: HotelRating word → 1-5; anything else (incl. 'All') → NULL
#: (reference main.py:23-29 — CASE with no ELSE).
RATING_MAP = {
    "OneStar": 1,
    "TwoStar": 2,
    "ThreeStar": 3,
    "FourStar": 4,
    "FiveStar": 5,
}


def with_rating(hotels: DataFrame) -> DataFrame:
    return hotels.withColumn("rating", case_map("HotelRating", RATING_MAP))


def q1_hotels_by_country(hotels: DataFrame) -> DataFrame:
    """Hotels per country + avg rating + percent of world
    (reference main.py:18-52)."""
    county = (
        with_rating(hotels)
        .filter(~F.col("HotelRating").isin("All"))
        .groupBy("countyName")
        .agg(
            F.countDistinct("HotelCode").alias("num_hotels"),
            F.round(F.avg("rating"), 2).alias("avg_rating"),
        )
    )
    return (
        percent_of_total(county, "num_hotels", pct_col="pct_of_world")
        .select("countyName", "num_hotels", "avg_rating", "pct_of_world")
        .orderBy(F.desc("num_hotels"), "countyName")
    )


def q2_luxury_hotels(hotels: DataFrame) -> DataFrame:
    """Five-star hotels per country, percent of world luxury, with the
    global total attached (reference main.py:54-74; the IN list
    includes 'All' — preserved verbatim, main.py:60)."""
    county = (
        hotels.filter(F.col("HotelRating").isin("FiveStar", "All"))
        .groupBy("countyName")
        .agg(F.countDistinct("HotelCode").alias("num_luxury_hotels"))
    )
    return (
        percent_of_total(
            county,
            "num_luxury_hotels",
            pct_col="pct_of_world_luxury",
            total_col="total_luxury_hotels_worldwide",
        )
        .select(
            "countyName",
            "num_luxury_hotels",
            "pct_of_world_luxury",
            "total_luxury_hotels_worldwide",
        )
        .orderBy(F.desc("num_luxury_hotels"), "countyName")
    )


def q3_booking_websites(hotels: DataFrame) -> DataFrame:
    """One-row conditional-distinct breakdown of website presence
    (reference main.py:76-91)."""
    booking = F.countDistinct(
        F.when(
            F.lower(F.col("HotelWebsiteUrl")).like("%booking%"), F.col("HotelCode")
        )
    )
    with_url = F.countDistinct(
        F.when(F.col("HotelWebsiteUrl").isNotNull(), F.col("HotelCode"))
    )
    total = F.countDistinct("HotelCode")
    return hotels.agg(
        booking.alias("hotels_with_booking"),
        total.alias("total_hotels"),
        with_url.alias("hotels_with_urls"),
        F.round(booking * 100.0 / total, 2).alias("pct_of_all_hotels"),
        F.round(booking * 100.0 / with_url, 2).alias("pct_of_hotels_with_urls"),
    )


def q4_country_rank(hotels: DataFrame) -> DataFrame:
    """Country ranking by hotel count with percent-of-top
    (reference main.py:93-108)."""
    county = hotels.groupBy("countyName").agg(
        F.countDistinct("HotelCode").alias("num_hotels")
    )
    w = Window.orderBy(F.desc("num_hotels"))
    return county.select(
        "countyName",
        "num_hotels",
        F.rank().over(w).alias("rank_in_world"),
        F.round(F.lit(100.0) * F.col("num_hotels") / F.first("num_hotels").over(w), 2).alias(
            "pct_of_top"
        ),
    ).orderBy("rank_in_world", "countyName")


def q5_five_star_attractions(hotels: DataFrame) -> DataFrame:
    """Five-star hotels with attractions: token counting + multi-metric
    agg + top-10 (reference main.py:110-137; counts DISTINCT HotelName,
    not HotelCode — preserved, main.py:122)."""
    base = (
        hotels.filter(
            (F.col("HotelRating") == "FiveStar") & (F.trim(F.col("Attractions")) != "")
        )
        .select(
            "countyName",
            "HotelName",
            token_count(F.col("Attractions"), ",").alias("num_attractions"),
        )
    )
    return (
        base.groupBy("countyName")
        .agg(
            F.countDistinct("HotelName").alias("num_five_star_hotels"),
            F.sum("num_attractions").cast("long").alias("total_attractions"),
            F.round(F.avg("num_attractions"), 2).alias("avg_attractions_per_hotel"),
        )
        .orderBy(F.desc("total_attractions"), "countyName")
        .limit(10)
    )


def q6_city_concentration(hotels: DataFrame) -> DataFrame:
    """Hotels-per-city concentration, top-10 (reference main.py:139-159)."""
    county = (
        hotels.filter(F.trim(F.col("cityName")) != "")
        .groupBy("countyName")
        .agg(
            F.countDistinct("HotelCode").alias("num_hotels"),
            F.countDistinct("cityName").alias("total_cities"),
        )
        .filter(F.col("total_cities") > 0)
    )
    return (
        county.select(
            "countyName",
            "num_hotels",
            "total_cities",
            F.round(F.lit(1.0) * F.col("num_hotels") / F.col("total_cities"), 2).alias(
                "hotels_per_city"
            ),
        )
        .orderBy(F.desc("hotels_per_city"), "countyName")
        .limit(10)
    )


HOTEL_QUERIES = {
    "hotels_q1": q1_hotels_by_country,
    "hotels_q2": q2_luxury_hotels,
    "hotels_q3": q3_booking_websites,
    "hotels_q4": q4_country_rank,
    "hotels_q5": q5_five_star_attractions,
    "hotels_q6": q6_city_concentration,
}
