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
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import query_persist, table
from ..operators.multimodal import extract_features
from .registry import register

#: Every query in this module audits a BOUNDED media grain (the first
#: 50 docs — the serving/demo tier; the full-corpus path is the
#: operators' contract).  One partition for the 50-row bound, placed
#: BEFORE the Python stage (round-13, guide §4.1/§2.4): the cached
#: corpus scan is 16 partitions, so every mapInPandas here paid 16
#: Python-worker dispatches for ~3 rows each — and a SinglePartition
#: child also lets the final orderBy skip RangePartitioning's
#: plan-sampling pass, which was re-executing the whole synth+decode
#: chain a second time per run (2 jobs -> 1).
#:
#: ``partitions`` (round-14, guide §2.6 — idle capacity): the single
#: partition is right for the cheap PPM/WAV/PNG grains but WRONG for
#: a CPU-bound Python stage — the shared pin serialized
#: audio_codec_transparency's per-doc FLAC encode + 4-way decode grid
#: onto ONE Python worker (0.45 s -> 1.10 s, round-13 verdict
#: regression #1).  Codec-grid queries pass a small fan-out instead;
#: they end in a scalar agg, so no orderBy sampling pass exists to
#: re-trigger.
def _bounded_docs(
    spark: SparkSession, sf_dir: str, partitions: int = 1
) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
        .repartition(partitions)
    )


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
    docs = _bounded_docs(spark, sf_dir)
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


def _text_to_ppm_png_stacked(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Both containers of the SAME image per doc — P6 PPM and a valid
    RGB PNG tiling identical pixel bytes — STACKED as two rows keyed
    ``doc_id*2 + kind`` (kind 0=PPM, 1=PNG), so one synthesis pass and
    one decoder pass cover both sides of the parity audit."""
    from ..operators.udtf_media import make_png_rgb

    for pdf in batches:
        ids, payloads = [], []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            raw = (t or " ").encode("utf-8", "replace")
            body = (raw * (_BODY // len(raw) + 1))[:_BODY]
            ids.extend((2 * d, 2 * d + 1))
            payloads.append(f"P6\n{_W} {_H}\n255\n".encode() + body)
            payloads.append(make_png_rgb(_W, _H, body))
        yield pd.DataFrame({"media_id": ids, "payload": payloads})


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
    docs = _bounded_docs(spark, sf_dir)
    # KIND-STACKED single pass (round-13, guide §2.4/§4.1): the old
    # shape fed one (media_id, ppm, png) synthesis subtree into TWO
    # extract_features legs, so the whole synthesis ran twice per
    # action (once per leg) and the legs re-joined on media_id.  Both
    # payloads now leave ONE synthesis pass as separate rows keyed
    # media_id*2+kind (kind 0=PPM, 1=PNG — invisible: the output is
    # the two audit counts), one decoder pass covers both, and the
    # parity compare is a per-doc aggregate instead of a join.
    stacked = docs.mapInPandas(
        _text_to_ppm_png_stacked, "media_id long, payload binary"
    )
    feats = extract_features(stacked, num_features=8, real_decoder=True)
    per_doc = feats.groupBy(
        F.floor(F.col("media_id") / 2).alias("doc")
    ).agg(
        F.first(
            F.when(F.col("media_id") % 2 == 0, F.col("features")),
            ignorenulls=True,
        ).alias("ppm_features"),
        F.first(
            F.when(F.col("media_id") % 2 == 1, F.col("features")),
            ignorenulls=True,
        ).alias("png_features"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(
            F.when(F.col("ppm_features") != F.col("png_features"), 1).otherwise(0)
        ).cast("long").alias("n_mismatched"),
    )


def _text_to_jpegs_stacked(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Both JPEG encodings of the SAME image per doc — baseline (SOF0)
    and progressive (SOF2, spectral selection + DC successive
    approximation) streams carrying identical quantized coefficients —
    STACKED as two rows keyed ``doc_id*2 + kind`` (kind 0=baseline,
    1=progressive), so one synthesis pass and one decoder pass cover
    both sides of the parity audit."""
    from ..operators.udtf_media import make_jpeg_gray

    for pdf in batches:
        ids, payloads = [], []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            raw = (t or " ").encode("utf-8", "replace")
            ids.extend((2 * d, 2 * d + 1))
            payloads.append(make_jpeg_gray(_W, _H, raw, progressive=False))
            payloads.append(make_jpeg_gray(_W, _H, raw, progressive=True))
        yield pd.DataFrame({"media_id": ids, "payload": payloads})


@register("media_jpeg_decode_parity")
def media_jpeg_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 decode-parity audit for the progressive JPEG tier (round-8
    verdict ask #6 — the corpus now carries REAL progressive payloads):
    each doc's pixels encoded BOTH as a baseline SOF0 JPEG and as a
    progressive SOF2 JPEG from the SAME quantized DCT coefficients,
    both decoded by the REAL pure-Python decoders (baseline huffman
    walk; multi-scan progressive coefficient accumulation), features
    compared.  n_mismatched must be 0 — lossy compression cancels out
    exactly because the coefficients match, so ANY divergence is a
    decoder-path bug.  Rows-only: DuckDB cannot entropy-decode JPEGs;
    the decode math itself is pinned by tests/test_multimodal.py's
    independent-encoder progressive tests.

    Scale shape: synthesis and both decodes are Arrow-batched
    mapInPandas; the join is a broadcast-size equi-join on media_id at
    the audited grain, and the output is one bounded summary row."""
    docs = _bounded_docs(spark, sf_dir)
    # KIND-STACKED single pass (round-13, guide §2.4/§4.1): the old
    # shape fed one (media_id, baseline, progressive) synthesis
    # subtree into TWO extract_features legs, so every doc was
    # ENCODED FOUR times per action (both kinds, once per leg) and
    # the legs re-joined on media_id.  Both encodings now leave ONE
    # synthesis pass as separate rows keyed media_id*2+kind, one
    # decoder pass covers both, and the parity compare is a per-doc
    # aggregate instead of a join.
    stacked = docs.mapInPandas(
        _text_to_jpegs_stacked, "media_id long, payload binary"
    )
    feats = extract_features(stacked, num_features=8, real_decoder=True)
    per_doc = feats.groupBy(
        F.floor(F.col("media_id") / 2).alias("doc")
    ).agg(
        F.first(
            F.when(F.col("media_id") % 2 == 0, F.col("features")),
            ignorenulls=True,
        ).alias("baseline_features"),
        F.first(
            F.when(F.col("media_id") % 2 == 1, F.col("features")),
            ignorenulls=True,
        ).alias("progressive_features"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(
            F.when(
                F.col("baseline_features") != F.col("progressive_features"), 1
            ).otherwise(0)
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
    docs = _bounded_docs(spark, sf_dir)
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

    docs = _bounded_docs(spark, sf_dir)
    media = docs.mapInPandas(_text_to_ppm, "media_id long, payload binary")
    return payload_stats_arrow(media).orderBy("media_id")


def _text_to_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Each doc's text bytes ARE the waveform: tiled to 2000 samples
    of 8-bit unsigned mono PCM at 8 kHz inside a canonical RIFF/WAVE
    container — a real, spec-conformant audio file per doc."""
    from ..operators.udtf_media import make_wav

    n_samples = 2000
    for pdf in batches:
        payloads = []
        for t in pdf["text"]:
            raw = (t or " ").encode("utf-8", "replace")
            data = (raw * (n_samples // len(raw) + 1))[:n_samples]
            payloads.append(make_wav(1, 8, data))
        yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})


@register("audio_features_real")
def audio_features_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 audio end-to-end: synthesize real PCM WAV payloads from
    document text (the bytes are the waveform), decode samples with
    the REAL stdlib decoder (real_decoder=True — any fallback would
    raise) and emit time- and FFT-domain features per clip
    (operators.multimodal.audio_features).  Rows-only: DuckDB cannot
    parse WAV or run FFTs; the decode math is pinned by
    tests/test_multimodal.py's analytic-sine tests.

    Scale shape: synthesis and decode are both Arrow-batched
    mapInPandas over the corpus — frequency-domain work never leaves
    the Python worker, and the output is one atomic row per clip."""
    from ..operators.multimodal import extract_audio_features

    docs = _bounded_docs(spark, sf_dir)
    media = docs.mapInPandas(_text_to_wav, "media_id long, payload binary")
    feats = extract_audio_features(media, real_decoder=True)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
        F.round("zcr", 6).alias("zcr"),
        F.round("spectral_centroid_hz", 4).alias("spectral_centroid_hz"),
        F.round("spectral_rolloff_hz", 4).alias("spectral_rolloff_hz"),
    ).orderBy("media_id")


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + len(body).to_bytes(4, "little") + body + pad


def _riff_list(ltype: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", ltype + body)


@lru_cache(maxsize=8)
def _avi_hdrl(strf: bytes) -> bytes:
    """Constant header chain per strf — memoized so the per-row
    container wrap doesn't rebuild it (the hoist the pre-refactor
    per-partition code had)."""
    return _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", bytes(56))
        + _riff_list(
            b"strl",
            _riff_chunk(b"strh", bytes(56)) + _riff_chunk(b"strf", strf),
        ),
    )


def _avi_container(frames, fourcc: bytes, strf: bytes) -> bytes:
    """Wrap frame payloads in a minimal RIFF AVI: hdrl (zeroed avih /
    strh plus the given strf BITMAPINFOHEADER) then a movi LIST of
    ``fourcc`` chunks — shared by the DIB corpus (video_frames_real)
    and the MJPEG parity corpus (video_container_parity) so the two
    syntheses can never diverge (round-10 review)."""
    hdrl = _avi_hdrl(bytes(strf))
    movi = _riff_list(b"movi", b"".join(_riff_chunk(fourcc, f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _text_to_avi(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Each doc becomes a 4-frame 8×8 uncompressed-DIB RIFF AVI; frame
    k tiles the text bytes starting at offset 48*k, so consecutive
    frames differ deterministically."""
    w = h = 8
    strf = bytearray(40)
    strf[0:4] = (40).to_bytes(4, "little")
    strf[4:8] = w.to_bytes(4, "little")
    strf[8:12] = h.to_bytes(4, "little")
    strf[12:14] = (1).to_bytes(2, "little")
    strf[14:16] = (24).to_bytes(2, "little")  # BI_RGB stays 0
    strf = bytes(strf)
    frame_bytes = w * h * 3  # stride == w*3, already a multiple of 4
    for pdf in batches:
        payloads = []
        for t in pdf["text"]:
            raw = (t or " ").encode("utf-8", "replace")
            tiled = (raw * ((4 * 48 + frame_bytes) // len(raw) + 1))
            frames = [
                tiled[48 * k : 48 * k + frame_bytes] for k in range(4)
            ]
            payloads.append(_avi_container(frames, b"00db", strf))
        yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})


@register("video_frames_real")
def video_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 video end-to-end: synthesize real 4-frame uncompressed-DIB
    AVI containers from document text, FRAME-SAMPLE at stride 2 (the
    walk skips unsampled frames without decoding — the cost model
    frame sampling exists for), decode sampled frames
    (operators.multimodal.decode_avi_frames) and emit the clip's mean
    per-frame feature vector.  MJPEG-in-AVI rides the same walk with
    the pure-Python JPEG decoder (pinned by tests).  Rows-only:
    DuckDB cannot walk RIFF containers; the decode is pinned by
    tests/test_multimodal.py's DIB/MJPEG frame tests.

    Scale shape: Arrow-batched mapInPandas end-to-end; features
    exploded to atomic rows for the driver canon."""
    from ..operators.multimodal import extract_video_features

    docs = _bounded_docs(spark, sf_dir)
    media = docs.mapInPandas(_text_to_avi, "media_id long, payload binary")
    feats = extract_video_features(media, frame_stride=2, real_decoder=True)
    return (
        feats.select(
            "media_id",
            "n_bytes",
            "n_frames_sampled",
            F.posexplode("frame_features").alias("feature_idx", "feature_value"),
        )
        .withColumn("feature_value", F.round("feature_value", 6))
        .orderBy("media_id", "feature_idx")
    )


def _text_to_wav_codecs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The SAME waveform per doc in three RIFF containers: 16-bit PCM
    (the reference), G.711 µ-law and A-law companded 8-bit (tags 7/6).
    Text bytes are the waveform, recentred to int16 scale.  A fourth
    leg carries a SMOOTH doc-keyed sine (byte noise defeats any
    differential codec by design) as IMA ADPCM (tag 17) plus its own
    PCM reference."""
    import numpy as np

    from ..operators.udtf_media import (
        flac_encode,
        g711_compress,
        ima_adpcm_compress,
        make_wav,
    )

    n_samples = 2000

    # only 5 distinct smooth clips exist (k = 1 + sum % 5): memo the
    # ~1500-step scalar ADPCM encode per executor instead of paying it
    # per document (round-10 review)
    smooth: dict[int, tuple[bytes, bytes]] = {}

    def smooth_pair(k: int) -> tuple[bytes, bytes]:
        if k not in smooth:
            xs = np.round(
                9000.0 * np.sin(2 * np.pi * k * np.arange(n_samples) / n_samples)
            ).astype(np.int64)
            adp, ba = ima_adpcm_compress(xs, spb=501)
            smooth[k] = (
                make_wav(1, 16, xs.astype("<i2").tobytes()),
                make_wav(17, 4, adp, block_align=ba),
            )
        return smooth[k]

    for pdf in batches:
        pcms, ulaws, alaws, spcms, adpcms, flacs = [], [], [], [], [], []
        for t in pdf["text"]:
            raw = (t or " ").encode("utf-8", "replace")
            tiled = (raw * (n_samples // len(raw) + 1))[:n_samples]
            x16 = (np.frombuffer(tiled, np.uint8).astype(np.int64) - 128) * 256
            pcms.append(make_wav(1, 16, x16.astype("<i2").tobytes()))
            ulaws.append(make_wav(7, 8, g711_compress(x16, "ulaw")))
            alaws.append(make_wav(6, 8, g711_compress(x16, "alaw")))
            # the LOSSLESS leg: the identical reference waveform as a
            # native-FLAC stream (round-12) — transparency bound is 0
            flacs.append(flac_encode([x16.tolist()], blocksize=512))
            sp, ad = smooth_pair(1 + sum(raw) % 5)
            spcms.append(sp)
            adpcms.append(ad)
        yield pd.DataFrame(
            {
                "media_id": pdf["doc_id"],
                "pcm": pcms,
                "ulaw": ulaws,
                "alaw": alaws,
                "pcm_smooth": spcms,
                "adpcm": adpcms,
                "flac": flacs,
            }
        )


def _codec_deltas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode all four containers with the REAL decoder and emit the
    max absolute sample deviation of each transcode from the PCM
    reference (None from any decoder would raise on .max())."""
    import numpy as np

    from ..operators.multimodal import decode_flac_samples, decode_wav_samples

    # 5 distinct smooth clips → memo the scalar ADPCM block decode
    # per executor, keyed on the payload bytes
    adpcm_dev: dict[bytes, float] = {}

    for pdf in batches:
        out = {
            "media_id": [],
            "ulaw_max_dev": [],
            "alaw_max_dev": [],
            "adpcm_max_dev": [],
            "flac_max_dev": [],
        }
        for mid, pcm, ul, al, sp, ad, fl in zip(
            pdf["media_id"],
            pdf["pcm"],
            pdf["ulaw"],
            pdf["alaw"],
            pdf["pcm_smooth"],
            pdf["adpcm"],
            pdf["flac"],
        ):
            ref, _ = decode_wav_samples(pcm)
            xu, _ = decode_wav_samples(ul)
            xa, _ = decode_wav_samples(al)
            xf, _ = decode_flac_samples(fl)
            key = bytes(ad)
            if key not in adpcm_dev:
                sref, _ = decode_wav_samples(sp)
                xd, _ = decode_wav_samples(ad)
                # the encoder drops the trailing partial block by contract
                adpcm_dev[key] = float(np.max(np.abs(xd - sref[: len(xd)])))
            out["media_id"].append(int(mid))
            out["ulaw_max_dev"].append(float(np.max(np.abs(xu - ref))))
            out["alaw_max_dev"].append(float(np.max(np.abs(xa - ref))))
            out["adpcm_max_dev"].append(adpcm_dev[key])
            out["flac_max_dev"].append(float(np.max(np.abs(xf - ref))))
        yield pd.DataFrame(out)


@register("audio_codec_transparency")
def audio_codec_transparency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 audio codec-transparency audit: each document's waveform
    carried as 16-bit PCM AND as G.711 µ-law/A-law companded streams,
    all decoded by the REAL decoder (segment expansions in
    multimodal.decode_wav_samples), per-clip max sample deviation
    compared against the codec's quantization bound (top-segment step
    1024/32768 = 0.03125 — any clip over it means a broken expansion
    or compression table).  Round 10 adds the IMA ADPCM leg: a smooth
    doc-keyed sine (differential codecs cannot track byte noise by
    design) encoded with udtf_media.ima_adpcm_compress, decoded by the
    real tag-17 block decoder, held to a 512/32768 tracking bound
    (measured headroom ~1.5× over the worst doc key, incl. the
    cold-start step-index ramp).  Round 12 adds the LOSSLESS leg:
    the same reference waveform as a native-FLAC stream
    (udtf_media.flac_encode), decoded by the full FLAC decoder
    (multimodal.decode_flac_samples — rice residuals, fixed/LPC
    predictors, CRC-8/16 + STREAMINFO md5 gates) and held to an
    EXACT-ZERO deviation bound.  The audit an audio-ingest pipeline
    runs before trusting transcoded corpora.  Rows-only: DuckDB
    cannot parse RIFF/FLAC or expand G.711/ADPCM; the expansions are
    pinned exactly by tests/test_multimodal.py's all-256-bytes G.711
    roundtrip and the bit-exact ADPCM/FLAC reconstruction parity
    against independent test encoders.

    Scale shape: synthesis, companding and decode are Arrow-batched
    mapInPandas end-to-end; output is one bounded summary row.  The
    codec grid (FLAC encode + full FLAC/G.711/ADPCM decodes per doc)
    is CPU-bound Python, so the bounded grain fans out over 8
    partitions instead of the module's 1-partition default — the
    round-13 shared pin serialized the grid onto one worker (verdict
    regression #1; guide §2.6)."""
    docs = _bounded_docs(spark, sf_dir, partitions=8)
    three = docs.mapInPandas(
        _text_to_wav_codecs,
        "media_id long, pcm binary, ulaw binary, alaw binary, "
        "pcm_smooth binary, adpcm binary, flac binary",
    )
    deltas = three.mapInPandas(
        _codec_deltas,
        "media_id long, ulaw_max_dev double, alaw_max_dev double, "
        "adpcm_max_dev double, flac_max_dev double",
    )
    bound = 1024.0 / 32768.0
    adpcm_bound = 512.0 / 32768.0
    return deltas.agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(F.when(F.col("ulaw_max_dev") <= bound, 0).otherwise(1))
        .cast("long").alias("n_ulaw_over_bound"),
        F.sum(F.when(F.col("alaw_max_dev") <= bound, 0).otherwise(1))
        .cast("long").alias("n_alaw_over_bound"),
        F.sum(F.when(F.col("adpcm_max_dev") <= adpcm_bound, 0).otherwise(1))
        .cast("long").alias("n_adpcm_over_bound"),
        # FLAC is LOSSLESS: the transparency bound is exact zero — any
        # nonzero deviation means a broken rice/predictor/CRC path.
        F.sum(F.when(F.col("flac_max_dev") == 0.0, 0).otherwise(1))
        .cast("long").alias("n_flac_nonzero"),
        F.round(F.max("ulaw_max_dev"), 6).alias("max_ulaw_dev"),
        F.round(F.max("alaw_max_dev"), 6).alias("max_alaw_dev"),
        F.round(F.max("adpcm_max_dev"), 6).alias("max_adpcm_dev"),
        F.round(F.max("flac_max_dev"), 6).alias("max_flac_dev"),
    )


def _text_to_both_video_containers(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """The SAME 3 motion-JPEG frames per doc in two containers: a
    RIFF AVI ('00dc' chunks) and an ISO-BMFF MP4 (QuickTime 'jpeg'
    sample entries, 2 samples per chunk so the stsc run expansion is
    on the audited path)."""
    from ..operators.udtf_media import make_jpeg_gray, make_mp4_mjpeg

    for pdf in batches:
        avis, mp4s = [], []
        for t in pdf["text"]:
            raw = (t or " ").encode("utf-8", "replace")
            frames = [
                make_jpeg_gray(16, 16, raw[k:] + raw + bytes([k]))
                for k in range(3)
            ]
            avis.append(_avi_container(frames, b"00dc", bytes(40)))
            mp4s.append(make_mp4_mjpeg(frames, 16, 16, samples_per_chunk=2))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "avi": avis, "mp4": mp4s}
        )


@register("video_container_parity")
def video_container_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 video container-transparency audit (round 10): each doc's 3
    motion-JPEG frames wrapped BOTH as RIFF AVI chunks and as an
    ISO-BMFF MP4 with a real sample table (stsd 'jpeg', stsc packing
    2 samples per chunk, stco offsets into mdat), both walked by the
    REAL container decoders (multimodal.decode_avi_frames /
    decode_mp4_frames) under real_decoder=True.  Identical JPEG
    sample bytes must decode to identical frame counts and feature
    vectors — a broken box walk, stale chunk offset, or stsc
    mis-expansion flips n_frame_mismatch / n_feature_mismatch off 0.
    The audit a multimodal-ingest pipeline runs before trusting a
    remuxed corpus.  Rows-only: DuckDB cannot walk either container;
    the walks themselves are pinned by tests/test_multimodal.py's
    independent test-side builders (_avi / _mp4) and the
    muxer-vs-AVI parity test.

    Scale shape: synthesis and both walks are Arrow-batched
    mapInPandas; the join is a broadcast-size equi-join on media_id
    at the audited grain and the output is one bounded summary row."""
    from ..operators.multimodal import extract_video_features

    docs = _bounded_docs(spark, sf_dir)
    # cached: both feature branches read this, and recomputing the
    # lineage would pay the pure-Python JPEG encodes twice (round-10
    # review).  Left persisted by the dedup.py / queries_parity.py
    # precedent: CacheManager dedupes by logical plan so repeated
    # invocations hold ONE ~50-row entry per sf_dir, and
    # catalog.release_caches drops it with the rest.
    both = query_persist(
        docs.mapInPandas(
            _text_to_both_video_containers,
            "media_id long, avi binary, mp4 binary",
        )
    )
    avi_f = extract_video_features(
        both.select("media_id", F.col("avi").alias("payload")),
        real_decoder=True,
    ).select(
        "media_id",
        F.col("n_frames_sampled").alias("avi_frames"),
        F.col("frame_features").alias("avi_features"),
    )
    mp4_f = extract_video_features(
        both.select("media_id", F.col("mp4").alias("payload")),
        real_decoder=True,
    ).select(
        "media_id",
        F.col("n_frames_sampled").alias("mp4_frames"),
        F.col("frame_features").alias("mp4_features"),
    )
    joined = avi_f.join(mp4_f, "media_id")
    dev = F.aggregate(
        F.zip_with(
            "avi_features", "mp4_features", lambda a, b: F.abs(a - b)
        ),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(
            F.when(F.col("avi_frames") == F.col("mp4_frames"), 0).otherwise(1)
        ).cast("long").alias("n_frame_mismatch"),
        F.sum(F.when(dev == 0.0, 0).otherwise(1))
        .cast("long")
        .alias("n_feature_mismatch"),
    )
