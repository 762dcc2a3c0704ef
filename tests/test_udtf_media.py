"""PNG chunk-walk UDTF tests (operators/udtf_media.py).

Pins the walk against hand-corrupted payloads: valid files yield the
IHDR/IDAT/IEND sequence with good CRCs, a flipped data byte fails
exactly its chunk's CRC, a truncated file yields a truncated-marked
row and stops, and non-PNG payloads yield nothing.
"""

from __future__ import annotations

from ex9_big_data_gal_drimer_spark.operators.udtf_media import (
    PNG_SIG,
    PngChunkWalk,
    make_png,
)
from ex9_big_data_gal_drimer_spark.plans import QUERIES

from conftest import SF_DIR


def _walk(spark, payload):
    df = spark.createDataFrame([(payload,)], "payload binary")
    df.createOrReplaceTempView("png_one")
    spark.udtf.register("png_chunk_walk_t", PngChunkWalk)
    return spark.sql(
        "SELECT c.* FROM png_one, LATERAL png_chunk_walk_t(payload) c"
    ).collect()


def test_valid_png_walk(spark):
    rows = _walk(spark, make_png(8, 8, b"abc"))
    assert [r["chunk_type"] for r in rows] == ["IHDR", "IDAT", "IEND"]
    assert all(r["crc_ok"] and not r["truncated"] for r in rows)
    assert rows[0]["data_len"] == 13  # IHDR is always 13 bytes


def test_corrupt_byte_fails_that_chunks_crc(spark):
    buf = bytearray(make_png(8, 8, b"abc"))
    # flip one byte inside IDAT's data (IHDR chunk = 8 sig + 25 bytes)
    idat_data_start = len(PNG_SIG) + 25 + 8
    buf[idat_data_start] ^= 0xFF
    rows = _walk(spark, bytes(buf))
    by_type = {r["chunk_type"]: r for r in rows}
    assert by_type["IHDR"]["crc_ok"] and not by_type["IDAT"]["crc_ok"]


def test_truncated_png_marks_and_stops(spark):
    full = make_png(8, 8, b"abc")
    rows = _walk(spark, full[: len(full) - 16])  # cut into IEND/IDAT tail
    assert rows and rows[-1]["truncated"]


def test_non_png_yields_nothing(spark):
    assert _walk(spark, b"P6\n8 8\n255\n" + b"\x00" * 192) == []


def test_audit_query_counts_match_corpus(spark):
    rows = QUERIES["media_png_chunk_audit"](spark, SF_DIR).collect()
    by_type = {r["chunk_type"]: r for r in rows}
    assert set(by_type) == {"IHDR", "IDAT", "IEND"}
    n = by_type["IHDR"]["n_chunks"]
    assert all(r["n_chunks"] == n and r["n_crc_ok"] == n for r in rows)
    assert all(r["n_truncated"] == 0 for r in rows)


# ---------------------------------------------------------------------------
# Polymorphic UDTF + Arrow-optimized scalar Python UDF tiers
# ---------------------------------------------------------------------------


def test_polymorphic_udtf_schema_tracks_constant_arg(spark):
    """analyze() derives the output schema from the call site: the
    same function yields 2 or 3 typed columns depending on n."""
    from ex9_big_data_gal_drimer_spark.operators.udtf_media import (
        register_token_windows,
    )

    register_token_windows(spark)
    three = spark.sql("SELECT * FROM token_windows('a b c d', 3)")
    assert three.columns == ["t1", "t2", "t3"]
    assert [tuple(r) for r in three.collect()] == [
        ("a", "b", "c"),
        ("b", "c", "d"),
    ]
    two = spark.sql("SELECT * FROM token_windows('a b c d', 2)")
    assert two.columns == ["t1", "t2"]
    assert len(two.collect()) == 3


def test_polymorphic_udtf_lateral_over_table(spark):
    from ex9_big_data_gal_drimer_spark.operators.udtf_media import (
        register_token_windows,
    )

    register_token_windows(spark)
    got = spark.sql(
        """
        SELECT d.id, w.t1, w.t2
        FROM VALUES (1, 'x y z'), (2, 'p q') AS d(id, s),
             LATERAL token_windows(d.s, 2) AS w
        """
    ).collect()
    assert sorted((r.id, r.t1, r.t2) for r in got) == [
        (1, "x", "y"),
        (1, "y", "z"),
        (2, "p", "q"),
    ]


def test_arrow_optimized_scalar_udf(spark):
    """The Spark-4 Arrow-optimized scalar Python UDF (useArrow=True)
    runs through ArrowEvalPython — Arrow batch transfer without the
    pandas_udf signature change; completes the Python boundary tier
    next to row-UDF (avoided), pandas_udf, and mapInArrow."""
    from pyspark.sql import functions as F

    doubled = F.udf(lambda x: x * 2.0, "double", useArrow=True)
    df = spark.range(8).select(doubled(F.col("id").cast("double")).alias("y"))
    assert [r.y for r in df.collect()] == [float(2 * i) for i in range(8)]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
