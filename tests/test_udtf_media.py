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
