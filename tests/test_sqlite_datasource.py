"""SQLite Python DataSource (sources/sqlite_ds.py): schema inference,
rowid-range partitioning, Arrow-batch reads, and 4.1 filter pushdown.

The reference reads its exported ``small_tables.db`` back with raw
sqlite3 calls (reference dashboard.py:8-25); here the read side is a
registered Spark format, so the serving DB participates in real plans.
"""

from __future__ import annotations

import sqlite3

import pytest

from ex9_big_data_gal_drimer_spark.sources.sqlite_ds import (
    register_sqlite_source,
    sqlite_table_schema,
)


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sqliteds") / "t.db")
    with sqlite3.connect(path) as c:
        c.execute(
            "CREATE TABLE people (id INTEGER, name TEXT, score REAL, payload BLOB)"
        )
        c.executemany(
            "INSERT INTO people VALUES (?,?,?,?)",
            [
                (
                    i,
                    "100%_match" if i == 500 else f"name{i}",
                    i * 1.5 if i % 7 else None,
                    bytes([i % 256]) if i % 3 else None,
                )
                for i in range(1000)
            ],
        )
        c.execute("CREATE TABLE empty (x INTEGER)")
    return path


@pytest.fixture(scope="module")
def sqlite_spark(spark, db):
    register_sqlite_source(spark)
    return spark


def _read(spark, db, table="people", parts="3"):
    return (
        spark.read.format("sqlite")
        .option("path", db)
        .option("table", table)
        .option("numPartitions", parts)
        .load()
    )


def test_schema_inference_affinities(db):
    schema = sqlite_table_schema(db, "people")
    assert [f.dataType.simpleString() for f in schema.fields] == [
        "bigint",
        "string",
        "double",
        "binary",
    ]


def test_full_scan_roundtrip(sqlite_spark, db):
    df = _read(sqlite_spark, db)
    assert df.rdd.getNumPartitions() == 3
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 1000
    assert rows[3].name == "name3" and rows[3].score == 4.5
    assert rows[7].score is None  # 7 % 7 == 0 → NULL at insert
    assert rows[6].payload is None and rows[7].payload == bytes([7])


def test_partition_count_caps_at_rows(sqlite_spark, db):
    df = _read(sqlite_spark, db, parts="5000")
    assert df.rdd.getNumPartitions() == 1000
    assert df.count() == 1000


def test_empty_table(sqlite_spark, db):
    assert _read(sqlite_spark, db, table="empty").count() == 0


def test_filter_pushdown_range_and_prefix(sqlite_spark, db):
    df = _read(sqlite_spark, db)
    flt = df.filter((df.id > 990) & df.name.startswith("name99"))
    assert sorted(r.id for r in flt.collect()) == list(range(991, 1000))
    # everything compiled into the SQLite WHERE: no residual Filter node
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan sqlite" in plan and "Filter" not in plan.replace(
        "RuntimeFilters", ""
    )


def test_pushdown_like_escaping(sqlite_spark, db):
    # contains('%') must match the literal percent, not act as a wildcard
    df = _read(sqlite_spark, db)
    got = df.filter(df.name.contains("%")).collect()
    assert [r.id for r in got] == [500]
    got2 = df.filter(df.name.endswith("_match")).collect()
    assert [r.id for r in got2] == [500]


def test_pushdown_in_and_null(sqlite_spark, db):
    df = _read(sqlite_spark, db)
    assert sorted(
        r.id for r in df.filter(df.id.isin([5, 7, 9000])).collect()
    ) == [5, 7]
    assert df.filter(df.score.isNull()).count() == sum(
        1 for i in range(1000) if i % 7 == 0
    )


def test_unsupported_filter_falls_back(sqlite_spark, db):
    # id % 2 == 0 is not a pushable Filter — Spark must evaluate it
    df = _read(sqlite_spark, db)
    from pyspark.sql import functions as F

    got = df.filter((F.col("id") % 97 == 0) & (F.col("id") > 0)).collect()
    assert sorted(r.id for r in got) == [97 * k for k in range(1, 11)]


def test_matches_reference_export_path(sqlite_spark, db, tmp_path):
    """End-to-end with the pipeline's own SQLite export (S9 → S10)."""
    import pandas as pd

    out = str(tmp_path / "small_tables.db")
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    with sqlite3.connect(out) as conn:
        pdf.to_sql("t_sample", conn, index=False)
    back = _read(sqlite_spark, out, table="t_sample", parts="2")
    assert sorted((r.a, r.b) for r in back.collect()) == [
        (1, "x"),
        (2, "y"),
        (3, "z"),
    ]


# ---------------------------------------------------------------------------
# Write side: per-task temp-db spills merged in the driver commit
# ---------------------------------------------------------------------------


def test_writer_overwrite_roundtrip(sqlite_spark, tmp_path):
    out = str(tmp_path / "sink.db")
    df = sqlite_spark.range(100).selectExpr(
        "id", "CAST(id * 1.5 AS DOUBLE) AS score", "CONCAT('u', id) AS name"
    ).repartition(4)
    df.write.format("sqlite").option("path", out).option(
        "table", "t_out"
    ).mode("overwrite").save()
    back = _read(sqlite_spark, out, table="t_out", parts="2")
    assert back.count() == 100
    got = {r.id: (r.score, r.name) for r in back.collect()}
    assert got[7] == (10.5, "u7")
    # no spill residue next to the target
    import glob

    assert glob.glob(out + ".spill-*") == []


def test_writer_append_accumulates(sqlite_spark, tmp_path):
    out = str(tmp_path / "sink_append.db")
    base = sqlite_spark.range(10).selectExpr("id")
    base.write.format("sqlite").option("path", out).option(
        "table", "t_acc"
    ).mode("overwrite").save()
    base.write.format("sqlite").option("path", out).option(
        "table", "t_acc"
    ).mode("append").save()
    assert _read(sqlite_spark, out, table="t_acc").count() == 20


def test_writer_append_by_name_not_position(sqlite_spark, tmp_path):
    """Appending into a pre-existing table whose column ORDER differs
    from the write schema must land values by NAME (positional insert
    silently scrambled columns before the fix)."""
    out = str(tmp_path / "sink_byname.db")
    with sqlite3.connect(out) as c:
        c.execute("CREATE TABLE t_names (name TEXT, id INTEGER)")
        c.execute("INSERT INTO t_names VALUES ('seed', 999)")
    df = sqlite_spark.range(3).selectExpr("id", "CONCAT('u', id) AS name")
    df.write.format("sqlite").option("path", out).option(
        "table", "t_names"
    ).mode("append").save()
    with sqlite3.connect(out) as c:
        got = dict(c.execute("SELECT id, name FROM t_names").fetchall())
    assert got[999] == "seed" and got[1] == "u1" and got[2] == "u2"


def test_writer_append_schema_mismatch_errors(sqlite_spark, tmp_path):
    """Appending into a table with DIFFERENT column names must raise,
    not write by position."""
    out = str(tmp_path / "sink_mismatch.db")
    with sqlite3.connect(out) as c:
        c.execute("CREATE TABLE t_mm (a INTEGER, b TEXT)")
    df = sqlite_spark.range(3).selectExpr("id", "CONCAT('u', id) AS name")
    with pytest.raises(Exception, match="append schema mismatch"):
        df.write.format("sqlite").option("path", out).option(
            "table", "t_mm"
        ).mode("append").save()
    with sqlite3.connect(out) as c:
        assert c.execute("SELECT COUNT(*) FROM t_mm").fetchone()[0] == 0


def test_commit_sweeps_orphaned_staging_and_spills(sqlite_spark, tmp_path):
    """A crash mid-commit of a previous run can orphan a
    <table>__staging_<hex> table and *.spill-* files; the next commit
    for the same target must sweep them."""
    out = str(tmp_path / "sink_sweep.db")
    with sqlite3.connect(out) as c:
        c.execute("CREATE TABLE t_sw__staging_deadbeef (id INTEGER)")
        c.execute("CREATE TABLE t_sw_other (id INTEGER)")  # must survive
    stale_spill = out + ".spill-0-deadbeef"
    with sqlite3.connect(stale_spill) as c:
        c.execute("CREATE TABLE spill (id INTEGER)")
    import os as _os

    # the sweep is age-gated (a concurrent writer's fresh spills must
    # survive); backdate the planted residue past the threshold
    _os.utime(stale_spill, (1, 1))
    fresh_spill = out + ".spill-1-cafebabe"
    with sqlite3.connect(fresh_spill) as c:
        c.execute("CREATE TABLE spill (id INTEGER)")
    sqlite_spark.range(5).write.format("sqlite").option("path", out).option(
        "table", "t_sw"
    ).mode("overwrite").save()
    import glob as _glob

    # stale residue reclaimed; the fresh (possibly concurrent) spill kept
    assert _glob.glob(out + ".spill-*") == [fresh_spill]
    _os.unlink(fresh_spill)
    with sqlite3.connect(out) as c:
        names = {
            r[0]
            for r in c.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        }
    assert "t_sw" in names and "t_sw_other" in names
    assert not any("__staging_" in n for n in names)


def test_writer_overwrite_replaces(sqlite_spark, tmp_path):
    out = str(tmp_path / "sink_repl.db")
    for n in (50, 5):
        sqlite_spark.range(n).write.format("sqlite").option(
            "path", out
        ).option("table", "t_repl").mode("overwrite").save()
    assert _read(sqlite_spark, out, table="t_repl").count() == 5


# ---------------------------------------------------------------------------
# Stream side: rowid high-water-mark tail with checkpointed offsets
# ---------------------------------------------------------------------------


def _append_rows(db, table, rows):
    with sqlite3.connect(db) as c:
        c.executemany(f"INSERT INTO {table} VALUES (?,?)", rows)


def test_stream_tails_only_new_rows(sqlite_spark, tmp_path):
    db = str(tmp_path / "tail.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE feed (id INTEGER, v TEXT)")
    _append_rows(db, "feed", [(i, f"a{i}") for i in range(5)])
    ckpt = str(tmp_path / "ckpt")
    seen = []

    def run_batch():
        stream = (
            sqlite_spark.readStream.format("sqlite")
            .option("path", db)
            .option("table", "feed")
            .option("numPartitions", "2")
            .load()
        )
        assert stream.isStreaming
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(
                lambda bdf, bid: seen.append(
                    sorted((r.id, r.v) for r in bdf.collect())
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    _append_rows(db, "feed", [(i, f"b{i}") for i in range(5, 8)])
    run_batch()

    batches = [b for b in seen if b]
    assert batches[0] == [(i, f"a{i}") for i in range(5)]
    # the restarted query resumed from the checkpointed high-water
    # mark: ONLY the three appended rows, no re-delivery
    assert batches[-1] == [(i, f"b{i}") for i in range(5, 8)]
    assert sum(len(b) for b in batches) == 8


# ---------------------------------------------------------------------------
# Property: write → read roundtrip preserves the row multiset
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_cells = st.one_of(
    st.none(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=True, width=64),
    st.text(max_size=20),  # unicode incl. quotes/%/_
    st.binary(max_size=20),
)
_rows = st.lists(
    st.tuples(st.integers(0, 10**6), _cells, _cells), min_size=0, max_size=25
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_writer_reader_roundtrip_property(sqlite_spark, tmp_path_factory, rows):
    """Arbitrary generated values — None / ints / ±inf floats /
    unicode (quotes, %, _) / bytes — rendered into string and binary
    columns survive sink → source unchanged as a multiset, across a
    3-partition write and a 2-partition read."""
    spark = sqlite_spark
    out = str(tmp_path_factory.mktemp("prop") / "prop.db")
    def as_str(v):
        return None if v is None else (v.hex() if isinstance(v, bytes) else str(v))

    def as_bytes(v):
        return None if v is None else (v if isinstance(v, bytes) else str(v).encode())

    df = spark.createDataFrame(
        [(i, as_str(x), as_bytes(b)) for i, x, b in rows],
        "id long, x string, y binary",
    ).repartition(3)
    df.write.format("sqlite").option("path", out).option("table", "t").mode(
        "overwrite"
    ).save()
    back = (
        spark.read.format("sqlite")
        .option("path", out)
        .option("table", "t")
        .option("numPartitions", "2")
        .load()
    )
    want = sorted(
        ((r.id, r.x, bytes(r.y) if r.y is not None else None) for r in df.collect()),
        key=repr,
    )
    got = sorted(
        ((r.id, r.x, bytes(r.y) if r.y is not None else None) for r in back.collect()),
        key=repr,
    )
    assert got == want


def test_without_rowid_and_view_fall_back_to_full_scan(sqlite_spark, tmp_path):
    """WITHOUT ROWID tables and views have no rowid to slice on; the
    source must degrade to a correct single-partition scan (with
    pushdown still applied) instead of crashing at planning."""
    db = str(tmp_path / "norowid.db")
    with sqlite3.connect(db) as c:
        c.execute(
            "CREATE TABLE kv (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID"
        )
        c.executemany(
            "INSERT INTO kv VALUES (?,?)", [(f"k{i}", i) for i in range(50)]
        )
        c.execute("CREATE VIEW kv_doubled AS SELECT k, v * 2 AS v FROM kv")
    t = _read(sqlite_spark, db, table="kv", parts="4")
    assert t.rdd.getNumPartitions() == 1
    assert t.count() == 50
    flt = t.filter(t.v >= 48)
    assert sorted((r.k, r.v) for r in flt.collect()) == [("k48", 48), ("k49", 49)]
    view = _read(sqlite_spark, db, table="kv_doubled", parts="4")
    assert view.count() == 50
    assert view.filter(view.v == 98).collect()[0].k == "k49"


# ---------------------------------------------------------------------------
# Review-round regressions: case-sensitive pushdown, identifier quoting,
# Decimal writes, atomic overwrite
# ---------------------------------------------------------------------------


def test_pushdown_string_predicates_are_case_sensitive(sqlite_spark, tmp_path):
    """SQLite LIKE is ASCII-case-insensitive; Spark's string predicates
    are case-sensitive, and pushed filters are never re-checked by
    Spark — so the pushdown must NOT use LIKE (substr/instr do)."""
    db = str(tmp_path / "case.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE t (id INTEGER, name TEXT)")
        c.executemany(
            "INSERT INTO t VALUES (?,?)",
            [(1, "Alice"), (2, "alice"), (3, "ALICE"), (4, "malice")],
        )
    df = _read(sqlite_spark, db, table="t")
    assert [r.id for r in df.filter(df.name.startswith("al")).collect()] == [2]
    assert sorted(
        r.id for r in df.filter(df.name.endswith("lice")).collect()
    ) == [1, 2, 4]
    assert sorted(
        r.id for r in df.filter(df.name.contains("lic")).collect()
    ) == [1, 2, 4]
    # empty needle: true for every non-null string, same as Spark
    assert df.filter(df.name.contains("")).count() == 4


def test_quoted_table_name(sqlite_spark, tmp_path):
    db = str(tmp_path / "quoted.db")
    with sqlite3.connect(db) as c:
        c.execute('CREATE TABLE "weird""name" (x INTEGER)')
        c.execute('INSERT INTO "weird""name" VALUES (7)')
    df = _read(sqlite_spark, db, table='weird"name')
    assert [r.x for r in df.collect()] == [7]


def test_writer_decimal_column(sqlite_spark, tmp_path):
    out = str(tmp_path / "dec.db")
    df = sqlite_spark.sql(
        "SELECT id, CAST(id * 1.25 AS DECIMAL(10,2)) AS amt FROM range(4)"
    )
    df.write.format("sqlite").option("path", out).option("table", "d").mode(
        "overwrite"
    ).save()
    back = _read(sqlite_spark, out, table="d")
    assert sorted((r.id, r.amt) for r in back.collect()) == [
        (0, 0.0),
        (1, 1.25),
        (2, 2.5),
        (3, 3.75),
    ]


def test_overwrite_commit_leaves_no_staging_residue(sqlite_spark, tmp_path):
    out = str(tmp_path / "atomic.db")
    for _ in range(2):
        sqlite_spark.range(20).write.format("sqlite").option(
            "path", out
        ).option("table", "t_atomic").mode("overwrite").save()
    with sqlite3.connect(out) as c:
        tables = [
            r[0]
            for r in c.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        ]
    assert tables == ["t_atomic"], tables


def test_user_supplied_unsupported_schema_type_is_clear(sqlite_spark, db):
    from pyspark.sql.utils import AnalysisException

    bad = (
        sqlite_spark.read.format("sqlite")
        .schema("id date")
        .option("path", db)
        .option("table", "people")
        .load()
    )
    try:
        bad.collect()
        raise AssertionError("expected a failure for DateType column")
    except Exception as ex:  # noqa: BLE001
        assert "unsupported type" in str(ex) or "DATE" in str(ex).upper()
