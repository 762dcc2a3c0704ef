"""from_json_typed's malformed-JSON guard, exercised on PLANTED bad
rows (ADVICE r1: the testdata is 100% valid JSON, so the guard's
equivalence to the oracle's json_valid(props) was latent-untested).
"""

from __future__ import annotations

import duckdb
import pytest

from ex9_big_data_gal_drimer_spark.plans import ORACLES, QUERIES


@pytest.fixture(scope="module")
def dirty_events_dir(spark, tmp_path_factory):
    """A tmp sf-dir whose events table mixes valid, malformed, no-k,
    and NULL props rows."""
    rows = []
    for i in range(200):
        if i % 7 == 0:
            props = '{"k": 12, "broken'      # malformed → dropped
        elif i % 7 == 1:
            props = '{"other": 1}'           # valid, no k → NULL group
        elif i % 7 == 2:
            props = None                     # NULL props → dropped
        else:
            props = '{"k": %d}' % (i % 100)  # valid
        rows.append((i, 1000 + i, "click", float(i) / 10.0, props))
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    )
    out = tmp_path_factory.mktemp("dirty_sf")
    df.coalesce(1).write.parquet(str(out / "events.parquet"))
    return str(out)


def test_malformed_json_guard_matches_oracle(spark, dirty_events_dir):
    def nkey(row):
        return tuple((v is None, v if v is not None else 0) for v in row)

    sdf = QUERIES["from_json_typed"](spark, dirty_events_dir)
    spark_rows = sorted((tuple(r) for r in sdf.collect()), key=nkey)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{dirty_events_dir}/events.parquet/*.parquet'"
    )
    duck_rows = sorted(con.execute(ORACLES["from_json_typed"]).fetchall(), key=nkey)

    assert len(spark_rows) == len(duck_rows)
    for s, d in zip(spark_rows, duck_rows):
        assert s == pytest.approx(d)
    # sanity: the valid-JSON-without-k rows survive as the NULL group,
    # malformed and NULL-props rows are gone
    quartiles = {r[0] for r in spark_rows}
    assert None in quartiles
