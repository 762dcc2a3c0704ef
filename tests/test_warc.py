"""WARC crawl-container source (operators/warc.py, round-13).

Model: the multimodal corruption-grid tests — the parser must never
raise on hostile bytes, must resync past corrupt records, and the
Spark round-trip (frame → blob → parse → extract) must be
byte-transparent against extraction WITHOUT the WARC layer."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.operators.warc import (
    build_warc_record,
    parse_warc,
    parse_warc_blobs,
)
from ex9_big_data_gal_drimer_spark.plans import QUERIES

from conftest import SF_DIR


def _recs(n=3):
    return [
        build_warc_record(
            f"<html><p>doc {i} body</p></html>".encode(),
            target_uri=f"https://x.org/s/{i}",
            warc_date=f"2026-01-0{i + 1}T00:00:00Z",
        )
        for i in range(n)
    ]


def test_roundtrip_multiple_records():
    blob = b"".join(_recs(3))
    out = parse_warc(blob)
    assert len(out) == 3
    for i, r in enumerate(out):
        assert r["target_uri"] == f"https://x.org/s/{i}"
        assert r["warc_type"] == "response"
        assert r["payload"] == f"<html><p>doc {i} body</p></html>".encode()
        assert r["content_length"] == len(r["payload"])


def test_payload_containing_warc_magic_is_not_resplit():
    """Content-Length framing must win over magic scanning: a payload
    embedding 'WARC/1.0' (a crawl of a WARC spec page!) stays one
    record."""
    tricky = b"about WARC/1.0\r\n\r\nrecords and framing"
    blob = build_warc_record(tricky, target_uri="u1") + build_warc_record(
        b"next", target_uri="u2"
    )
    out = parse_warc(blob)
    assert [r["target_uri"] for r in out] == ["u1", "u2"]
    assert out[0]["payload"] == tricky


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[: len(b) // 2],  # truncated mid-payload
        lambda b: b.replace(b"Content-Length: ", b"Content-Length: 9999999", 1),
        lambda b: b.replace(b"Content-Length: ", b"Content-Length: zz", 1),
        lambda b: b.replace(b"WARC/1.0", b"WARC", 1),  # broken version line
        lambda b: b"\x00\xff garbage " + b,  # leading junk
        lambda b: b[:10],  # no header terminator at all
        lambda b: b"",
    ],
)
def test_corruption_never_raises(mutate):
    blob = mutate(build_warc_record(b"<p>x</p>", target_uri="u"))
    out = parse_warc(blob)  # must not raise
    assert isinstance(out, list)


def test_resync_recovers_records_after_corruption():
    """A corrupt record mid-stream must not take down the rest: the
    scan resyncs at the next WARC/ magic."""
    good1, bad, good2 = _recs(3)
    bad = bad.replace(b"Content-Length: ", b"Content-Length: 9999999", 1)
    out = parse_warc(good1 + bad + good2)
    assert [r["target_uri"] for r in out] == [
        "https://x.org/s/0",
        "https://x.org/s/2",
    ]


def test_spark_blob_parsing_roundtrip(spark):
    blobs = spark.createDataFrame(
        [(1, b"".join(_recs(2))), (2, _recs(1)[0]), (3, b"not a warc")],
        schema="blob_id int, blob binary",
    )
    rows = parse_warc_blobs(blobs).orderBy("blob_id", "rec_index").collect()
    assert [(r.blob_id, r.rec_index) for r in rows] == [(1, 0), (1, 1), (2, 0)]
    assert bytes(rows[2].payload) == b"<html><p>doc 0 body</p></html>"


def test_warc_extract_matches_direct_extraction(spark):
    """Byte-transparency: per-source fingerprint sums and char totals
    through frame → blob → parse → extract equal direct extraction of
    the same synthesized pages with NO WARC layer in between."""
    from ex9_big_data_gal_drimer_spark.catalog import table
    from ex9_big_data_gal_drimer_spark.operators.html import extract_text
    from ex9_big_data_gal_drimer_spark.plans.queries_platform6 import (
        synthesize_page,
    )

    via_warc = {
        r.source: r
        for r in QUERIES["warc_extract_docs"](spark, SF_DIR).collect()
    }
    docs = table(spark, SF_DIR, "documents")
    ex = docs.select(
        "source",
        extract_text(synthesize_page(F.col("doc_id"), F.col("text"))).alias(
            "extracted"
        ),
    )
    fp = F.conv(F.substring(F.md5("extracted"), 1, 8), 16, 10).cast("long")
    direct = {
        r.source: r
        for r in ex.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.length("extracted").cast("long")).alias("total_chars"),
            F.sum(fp).alias("fp_sum"),
        )
        .collect()
    }
    assert set(via_warc) == set(direct) and len(direct) > 0
    for s, d in direct.items():
        w = via_warc[s]
        assert (w.n_records, w.total_chars, w.fp_sum) == (
            d.n_records,
            d.total_chars,
            d.fp_sum,
        ), s
        assert w.n_uris == w.n_records  # one distinct URI per doc
