"""Multimodal column handling (SURVEY.md §2.11 X5).

Design: image/audio/video payloads are opaque ``binary`` columns
accompanied by a typed metadata struct (modality, mime, width/height/
duration, sha256).  All Spark-side plumbing — schemas, partitioning,
Arrow batch shape, UDF signatures — is real and tested; the actual
media decoding is STUBBED (the image/audio libraries are not in this
container): ``decode_stub_features`` derives deterministic fake
features from the bytes so pipelines are end-to-end testable, and
raises ``NotImplementedError`` when asked for a real decoder.

The reference's nearest seed is the never-parsed ``Map`` "lat|lon"
string column (hotels.csv col 13, SURVEY.md §1.2) — an opaque payload
with structure the engine can surface; `sources.csv.parse_map_column`
handles that case with pure column expressions.

Scale notes: media rows are large and skewed — the operators here
repartition by content hash before any per-row heavy work so one
executor doesn't receive all the 4K videos, and mapInPandas streams
Arrow batches instead of collecting rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed metadata accompanying every media payload.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sha256", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    modality: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Derive the metadata struct from a raw binary column (pure column
    expressions — sha2 and length run JVM-side)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ),
    )


def decode_stub_features(num_features: int = 8, real_decoder: bool = False):
    """Build a mapInPandas function extracting per-payload features.

    STUB: real image/audio decoding needs libraries absent from this
    environment; ``real_decoder=True`` raises NotImplementedError at
    call time.  The stub derives `num_features` deterministic doubles
    from the payload's sha256 — stable across runs/partitions, so the
    downstream pipeline (partitioning, schema, batch shape) is fully
    exercisable.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decoder:
            raise NotImplementedError(
                "real media decoding requires PIL/librosa/ffmpeg — not in this container"
            )
        for pdf in batches:
            payloads = pdf["payload"]
            digests = [hashlib.sha256(bytes(p)).hexdigest() for p in payloads]
            feats = [
                [
                    int(d[i * 8 : i * 8 + 8], 16) / 0xFFFFFFFF / 256.0
                    for i in range(num_features)
                ]
                for d in digests
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len),
                    "sha256": digests,
                    "features": feats,
                }
            )

    return fn


def extract_features(
    df: DataFrame, num_features: int = 8, partitions: int | None = None
) -> DataFrame:
    """Run the (stub) decoder over Arrow batches.

    Repartitions by payload hash first so skewed media sizes spread
    across executors — the pattern a real decoder needs at scale.
    """
    src = df.select("media_id", "payload")
    if partitions:
        src = src.repartition(partitions, F.sha2(F.col("payload"), 256))
    return src.mapInPandas(decode_stub_features(num_features), FEATURE_SCHEMA)


def exact_dedup_media(df: DataFrame) -> DataFrame:
    """Exact media dedup by payload sha256 (binary twin of the text
    fingerprint dedup): one hash shuffle, keeps min media_id."""
    return (
        df.groupBy(F.sha2(F.col("payload"), 256).alias("sha256"))
        .agg(F.min("media_id").alias("keep_media_id"), F.count(F.lit(1)).alias("n_copies"))
    )
