"""Error-tolerant CSV behavior on deliberately corrupt rows
(SURVEY.md §7 risk register: DROPMALFORMED vs DuckDB ignore_errors).

Pinned behavior on the three classic corruption shapes under FULL
projection: type-corrupt field (text in a BIGINT column), short row
(missing trailing columns), and long row (extra columns) are all
dropped by BOTH engines — clean-row parity holds exactly.

Spark sharp edge also pinned here (in spirit): with DROPMALFORMED the
surviving row count depends on the projected schema (a count() that
reads zero columns "parses" a short row that a full select drops) —
one more reason the engine lands CSV to Parquet once at ingest
(sources/csv.py) instead of re-scanning CSV per query.
"""

from __future__ import annotations

import csv

import duckdb
import pytest

from ex9_big_data_gal_drimer_spark.sources.csv import HOTELS_SCHEMA, read_hotels_csv

COLS = [f.name for f in HOTELS_SCHEMA.fields]
_DUCK_TYPES = {
    f.name: ("BIGINT" if f.dataType.simpleString() == "bigint" else "VARCHAR")
    for f in HOTELS_SCHEMA.fields
}


def _write_fixture(path: str) -> None:
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(COLS)
        for i in range(5):
            w.writerow(
                ["AL", "Albania", 600001, f"City{i}", 1000 + i, f"H{i}",
                 "ThreeStar", "addr", "", "desc", "", "fac", "1.0|2.0",
                 "ph", "123", "url"]
            )
        # type corrupt, short, long → all dropped by both engines
        w.writerow(["AL", "Albania", "NOT_A_NUMBER", "City", "ALSO_BAD", "H",
                    "All", "a", "", "d", "f", "f", "m", "p", "1", "u"])
        w.writerow(["AL", "Albania"])
        w.writerow(["AL", "Albania", 600002, "City", 2000, "H", "All", "a",
                    "", "d", "f", "f", "m", "p", "1", "u", "EXTRA"])


@pytest.fixture(scope="module")
def corrupt_csv(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corrupt") / "hotels.csv")
    _write_fixture(path)
    return path


def test_spark_drops_corrupt_rows(spark, corrupt_csv):
    srows = read_hotels_csv(spark, corrupt_csv).collect()
    # full projection: only the 5 clean rows survive
    assert sorted(r.HotelCode for r in srows) == [1000, 1001, 1002, 1003, 1004]


def test_clean_row_parity(spark, corrupt_csv):
    s_codes = sorted(
        r.HotelCode for r in read_hotels_csv(spark, corrupt_csv).collect()
    )
    cols_sql = ",".join(f"'{k}':'{v}'" for k, v in _DUCK_TYPES.items())
    con = duckdb.connect()
    drows = con.execute(
        f"SELECT HotelCode FROM read_csv('{corrupt_csv}', header=true, "
        f"ignore_errors=true, columns={{{cols_sql}}})"
    ).fetchall()
    con.close()
    # both engines keep exactly the clean rows
    assert s_codes == sorted(r[0] for r in drows) == [1000, 1001, 1002, 1003, 1004]
