"""WARC crawl-container source (round-12 verdict ask #4).

A real web crawl arrives as WARC files (ISO 28500): a concatenation of
records, each framed as a version line, CRLF-separated named headers,
a blank line, ``Content-Length`` payload octets, and a ``CRLF CRLF``
trailer.  The framing is pure-stdlib parseable — simpler than the
RIFF/ISO-BMFF walks in :mod:`multimodal` — so this module gives the
engine a genuine crawl ingestion path: bytes of one WARC blob in, one
row per record out, payloads feeding :mod:`html` extraction.

Reference analogue: none — the reference ingests a single CSV
(main.py:18); crawl containers are an engine extension for the
LLM-data-pipeline tier.

Scale shape: the parse unit is ONE blob (a file read via
``spark.read.format("binaryFile")`` or a synthesized column), walked
sequentially in Python inside an Arrow-batched ``mapInPandas`` — the
same executor-side pattern as the media decoders.  A 100 TB crawl is
tens of thousands of ~1 GB WARC files; each file is one task, so the
operator parallelizes at the file grain with no cross-blob state.

Never-raise contract (media-decoder precedent): a malformed record —
bad version line, unparseable or lying ``Content-Length``, missing
trailer, truncation — terminates cleanly or RESYNCS to the next
``WARC/`` magic instead of raising, so one corrupt record cannot kill
an executor task that still has valid records to yield.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Output schema of :func:`parse_warc_blobs` — one row per record.
WARC_RECORD_SCHEMA = (
    "blob_id bigint, rec_index int, warc_type string, target_uri string, "
    "warc_date string, content_length bigint, payload binary"
)

_MAGIC = b"WARC/"


def build_warc_record(
    payload: bytes,
    target_uri: str = "",
    warc_date: str = "",
    warc_type: str = "response",
    content_type: str = "text/html",
) -> bytes:
    """Serialize one WARC/1.0 record (fixture + round-trip helper)."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Target-URI: " + target_uri.encode(),
        b"WARC-Date: " + warc_date.encode(),
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def parse_warc(blob: bytes) -> list[dict]:
    """Parse one WARC blob into record dicts — pure stdlib, never
    raises on hostile input.

    Each well-formed record yields ``{"warc_type", "target_uri",
    "warc_date", "content_length", "payload"}``.  A record whose
    framing lies (bad version line, non-integer or negative
    Content-Length, payload running past the buffer) is SKIPPED and
    the scan resyncs at the next ``WARC/`` magic, so valid records
    after a corrupt region still parse.
    """
    out: list[dict] = []
    b = bytes(blob)
    pos = 0
    n = len(b)
    while pos < n:
        start = b.find(_MAGIC, pos)
        if start < 0:
            break
        head_end = b.find(b"\r\n\r\n", start)
        if head_end < 0:
            break  # truncated header block — nothing further can frame
        head = b[start:head_end]
        lines = head.split(b"\r\n")
        version = lines[0]
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        body_start = head_end + 4
        if (
            not version.startswith(b"WARC/")
            or length < 0
            or body_start + length > n
        ):
            pos = start + len(_MAGIC)  # resync past this magic
            continue
        out.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_length": length,
                "payload": b[body_start : body_start + length],
            }
        )
        pos = body_start + length  # trailer CRLFs skipped by find()
    return out


def _parser_fn():
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: dict[str, list] = {
                "blob_id": [],
                "rec_index": [],
                "warc_type": [],
                "target_uri": [],
                "warc_date": [],
                "content_length": [],
                "payload": [],
            }
            for blob_id, blob in zip(pdf["blob_id"], pdf["blob"]):
                for i, rec in enumerate(parse_warc(blob)):
                    rows["blob_id"].append(int(blob_id))
                    rows["rec_index"].append(i)
                    rows["warc_type"].append(rec["warc_type"])
                    rows["target_uri"].append(rec["target_uri"])
                    rows["warc_date"].append(rec["warc_date"])
                    rows["content_length"].append(rec["content_length"])
                    rows["payload"].append(rec["payload"])
            yield pd.DataFrame(rows)

    return fn


def parse_warc_blobs(
    df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id"
) -> DataFrame:
    """Explode a DataFrame of WARC blobs into one row per record.

    ``df`` needs ``id_col`` (bigint-castable) and ``blob_col``
    (binary).  Runs :func:`parse_warc` inside Arrow-batched
    ``mapInPandas`` — per-task state is one blob's records, and blobs
    parallelize across tasks (the file-grain unit of a real crawl).
    """
    src = df.select(
        F.col(id_col).cast("bigint").alias("blob_id"),
        F.col(blob_col).cast("binary").alias("blob"),
    )
    return src.mapInPandas(_parser_fn(), WARC_RECORD_SCHEMA)
