"""Multimodal feature-extraction query (SURVEY.md §2.11 X5).

The driver testdata has no media table, so the payloads are derived
deterministically FROM the documents table: each doc's text bytes are
tiled into an 8×8 RGB binary-PPM payload (a real, spec-conformant
image file), then the REAL stdlib decoder — not the hash stub — turns
pixels into features (operators.multimodal.pixel_features).  This
registers the decode→feature path in the driver gate as a rows-only
entry (pixel statistics are not expressible over parquet in DuckDB
SQL; the decode itself is pinned by tests/test_multimodal.py's
format-independence test).

Scale shape: payload build and decode are both Arrow-batched
mapInPandas over a hash-repartitioned corpus — the documented
"Python unavoidable → Arrow batches, never per-row" tier.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.multimodal import extract_features
from .registry import register

_W = _H = 8
_BODY = _W * _H * 3


def _text_to_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = []
        for t in pdf["text"]:
            raw = (t or " ").encode("utf-8", "replace")
            body = (raw * (_BODY // len(raw) + 1))[:_BODY]
            payloads.append(f"P6\n{_W} {_H}\n255\n".encode() + body)
        yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})


@register("media_features_real")
def media_features_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 end-to-end: synthesize real PPM image payloads from document
    text, decode pixels with the stdlib decoder (real_decoder=True —
    any fallback to the stub would raise), emit per-image feature
    vectors.  Rounded to 6 decimals so the output is hash-stable."""
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    media = docs.mapInPandas(_text_to_ppm, "media_id long, payload binary")
    feats = extract_features(media, num_features=8, real_decoder=True)
    # One row per (media_id, feature_idx): the driver's pandas-based
    # canonicalizer cannot hash ARRAY cells (round-3 verdict), so the
    # feature vector is exploded to atomic columns.
    return (
        feats.select(
            "media_id",
            "n_bytes",
            F.posexplode("features").alias("feature_idx", "feature_value"),
        )
        .withColumn("feature_value", F.round("feature_value", 6))
        .orderBy("media_id", "feature_idx")
    )


def _text_to_ppm_and_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Both containers of the SAME image per doc: P6 PPM and a valid
    RGB PNG tiling identical pixel bytes."""
    from ..operators.udtf_media import make_png_rgb

    for pdf in batches:
        ppms, pngs = [], []
        for t in pdf["text"]:
            raw = (t or " ").encode("utf-8", "replace")
            body = (raw * (_BODY // len(raw) + 1))[:_BODY]
            ppms.append(f"P6\n{_W} {_H}\n255\n".encode() + body)
            pngs.append(make_png_rgb(_W, _H, body))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "ppm": ppms, "png": pngs}
        )


@register("media_png_decode_parity")
def media_png_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 decode-parity audit (round-5 verdict ask #6 made a registry
    query): each doc's pixels encoded BOTH as P6 PPM and as a
    zlib-compressed RGB PNG, both decoded by the REAL stdlib decoders
    (PPM header parse; PNG inflate + unfilter), features compared.
    n_mismatched must be 0 — a decoder bug in either path flips it.
    Rows-only: DuckDB cannot inflate PNGs; the decode math itself is
    pinned by tests/test_multimodal.py's all-filters parity test.

    Scale shape: synthesis and both decodes are Arrow-batched
    mapInPandas; the join is a broadcast-size equi-join on media_id at
    the audited grain, and the output is one bounded summary row."""
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    both = docs.mapInPandas(
        _text_to_ppm_and_png, "media_id long, ppm binary, png binary"
    )
    ppm_f = extract_features(
        both.select("media_id", F.col("ppm").alias("payload")),
        num_features=8,
        real_decoder=True,
    ).select("media_id", F.col("features").alias("ppm_features"))
    png_f = extract_features(
        both.select("media_id", F.col("png").alias("payload")),
        num_features=8,
        real_decoder=True,
    ).select("media_id", F.col("features").alias("png_features"))
    joined = ppm_f.join(png_f, "media_id")
    return joined.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(
            F.when(F.col("ppm_features") != F.col("png_features"), 1).otherwise(0)
        ).cast("long").alias("n_mismatched"),
    )


def _text_to_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..operators.udtf_media import make_png

    for pdf in batches:
        payloads = [
            make_png(8, 8, (t or " ").encode("utf-8", "replace"))
            for t in pdf["text"]
        ]
        yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})


@register("media_png_chunk_audit")
def media_png_chunk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 container-structure audit via a Python UDTF (the table-
    function tier of the UDF surface): walk every synthesized PNG's
    chunk list (LATERAL fan-out, one output row per chunk) and roll up
    per chunk type — count, payload bytes, CRC validity, truncation.
    This is the integrity pass a media-ingest pipeline runs before
    decode; rows-only (DuckDB cannot synthesize or walk PNGs).

    Scale shape: payload synthesis and the UDTF both run inside
    Python workers over Arrow batches
    (spark.sql.execution.pythonUDTF.arrow.enabled), partition-local;
    the only shuffle is the final per-type rollup of primitive rows.
    """
    import os

    from ..operators.udtf_media import PngChunkWalk

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    media = docs.mapInPandas(_text_to_png, "media_id long, payload binary")
    view = f"png_media_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
    media.createOrReplaceTempView(view)
    spark.udtf.register("png_chunk_walk", PngChunkWalk)
    return spark.sql(
        f"""
        SELECT c.chunk_type,
               COUNT(*) AS n_chunks,
               CAST(SUM(c.data_len) AS BIGINT) AS total_data_bytes,
               COUNT(CASE WHEN c.crc_ok THEN 1 END) AS n_crc_ok,
               COUNT(CASE WHEN c.truncated THEN 1 END) AS n_truncated
        FROM {view}, LATERAL png_chunk_walk(payload) c
        GROUP BY 1
        ORDER BY 1
        """
    )


@register("media_payload_stats_arrow")
def media_payload_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 byte-level payload audit via `mapInArrow` — the lowest rung
    of the Python tier (raw RecordBatches, zero pandas boxing of
    binary values): per-payload size (from Arrow offsets alone),
    byte-histogram entropy, printable-ASCII heuristic over the
    synthesized PPM payloads.  The triage pass a media-ingest
    pipeline runs before any decode (flag truncated/low-entropy/
    mislabeled payloads).  Rows-only: payload synthesis is
    Python-side; determinism + known-byte cases pinned by
    tests/test_multimodal.py."""
    from ..operators.multimodal import payload_stats_arrow

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    media = docs.mapInPandas(_text_to_ppm, "media_id long, payload binary")
    return payload_stats_arrow(media).orderBy("media_id")
