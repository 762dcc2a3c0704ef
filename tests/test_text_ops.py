"""Text-operator tests: language-ID on a lang-distinct fixture (the
driver corpus shares one vocabulary across langs, so accuracy there is
chance by construction), plus quality-score sanity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.operators.text import (
    lang_id_predict,
    lang_id_train,
    quality_score,
)

VOCAB = {
    "en": ["the", "house", "is", "near", "river", "and", "forest", "light"],
    "fr": ["le", "maison", "est", "pres", "riviere", "et", "foret", "lumiere"],
    "de": ["das", "haus", "ist", "nahe", "fluss", "und", "wald", "licht"],
}


@pytest.fixture(scope="module")
def labeled_docs(spark):
    rng = random.Random(42)
    rows = []
    doc_id = 0
    for lang, words in VOCAB.items():
        for _ in range(40):
            n = rng.randint(8, 20)
            rows.append((doc_id, lang, " ".join(rng.choice(words) for _ in range(n))))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_lang_id_roundtrip(spark, labeled_docs):
    train = labeled_docs.filter(F.col("doc_id") % 4 != 0)
    test = labeled_docs.filter(F.col("doc_id") % 4 == 0)
    profiles = lang_id_train(train)
    assert profiles.count() > 0
    pred = lang_id_predict(test, profiles)
    joined = pred.join(test, "doc_id")
    acc = (
        joined.filter(F.col("predicted_lang") == F.col("lang")).count()
        / joined.count()
    )
    assert acc >= 0.95, f"lang-id accuracy {acc}"


def test_quality_score_ordering(spark):
    rows = [
        (1, "the house is near the river and the light of the forest is warm"),
        (2, "@@ ## $$ %% ^^ && ** (( ))"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {
        r.doc_id: r.q for r in df.select("doc_id", quality_score(F.col("text")).alias("q")).collect()
    }
    assert scores[1] > scores[2], "clean prose must outscore symbol soup"
    assert 0.0 <= scores[2] <= 1.0
