"""Multimodal plumbing tests (X5): binary columns, metadata structs,
Arrow-batched feature extraction (stub decoder), media dedup."""

from __future__ import annotations

import pytest

from ex9_big_data_gal_drimer_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    attach_media_meta,
    decode_stub_features,
    exact_dedup_media,
    extract_features,
)


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
