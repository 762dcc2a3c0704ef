"""Multimodal plumbing tests (X5): binary columns, metadata structs,
Arrow-batched feature extraction (stub decoder), media dedup."""

from __future__ import annotations

import pytest

from ex9_big_data_gal_drimer_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    attach_image_dims,
    attach_media_meta,
    decode_stub_features,
    exact_dedup_media,
    extract_features,
    parse_image_dims,
)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
        + b"\x00" * 4
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 6


def _jpeg(w: int, h: int) -> bytes:
    # SOI + APP0(JFIF) + COM (variable-position padding) + SOF0 + EOI
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    com = b"\xff\xfe" + (30).to_bytes(2, "big") + b"x" * 28
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, bytes([i % 251]) * (100 + 37 * (i % 7))) for i in range(40)
    ] + [(100, b"\xfa" * 999), (101, b"\xfa" * 999)]  # exact dup pair
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_attach_meta(spark, media):
    df = attach_media_meta(media, modality="image", mime="image/png")
    got = df.schema["meta"].dataType
    assert [(f.name, f.dataType) for f in got.fields] == [
        (f.name, f.dataType) for f in MEDIA_META_SCHEMA.fields
    ]
    row = df.first()
    assert row.meta.modality == "image"
    assert len(row.meta.sha256) == 64


def test_parse_image_dims_stdlib():
    assert parse_image_dims(_png(640, 480)) == (640, 480)
    assert parse_image_dims(_gif(320, 200)) == (320, 200)
    assert parse_image_dims(_jpeg(1920, 1080)) == (1920, 1080)
    assert parse_image_dims(b"not an image at all") is None


def test_attach_meta_sniffs_and_parses_headers(spark):
    rows = [
        (1, _png(640, 480)),
        (2, _gif(320, 200)),
        (3, _jpeg(1920, 1080)),
        (4, b"\x00opaque blob"),
    ]
    df = attach_media_meta(
        spark.createDataFrame(rows, "media_id long, payload binary")
    )
    by_id = {r.media_id: r.meta for r in df.collect()}
    # JVM-side: mime sniffed for all; dims parsed for fixed-offset formats
    assert by_id[1].mime == "image/png" and (by_id[1].width, by_id[1].height) == (640, 480)
    assert by_id[2].mime == "image/gif" and (by_id[2].width, by_id[2].height) == (320, 200)
    assert by_id[3].mime == "image/jpeg" and by_id[3].width is None
    assert by_id[4].mime == "application/octet-stream" and by_id[4].width is None
    # Arrow pass fills the JPEG (variable marker position) dims too
    full = {r.media_id: r.meta for r in attach_image_dims(df).collect()}
    assert (full[3].width, full[3].height) == (1920, 1080)
    assert (full[1].width, full[1].height) == (640, 480)
    assert full[4].width is None


def test_extract_features_stub(spark, media):
    feats = extract_features(media, num_features=8, partitions=4)
    rows = feats.collect()
    assert len(rows) == media.count()
    by_id = {r.media_id: r for r in rows}
    # deterministic: same payload → same features
    assert by_id[100].features == by_id[101].features
    assert by_id[100].sha256 == by_id[101].sha256
    assert all(len(r.features) == 8 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.features)
    assert by_id[0].n_bytes == 100


def test_real_decoder_is_stubbed():
    import pandas as pd

    fn = decode_stub_features(real_decoder=True)
    with pytest.raises(NotImplementedError):
        list(fn(iter([pd.DataFrame({"media_id": [1], "payload": [b"x"]})])))


def test_exact_dedup_media(spark, media):
    groups = exact_dedup_media(media)
    dup = groups.filter(groups.n_copies > 1).collect()
    assert len(dup) == 1
    assert dup[0].keep_media_id == 100
    assert dup[0].n_copies == 2
