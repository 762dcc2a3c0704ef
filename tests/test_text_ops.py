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


def test_keep_best_doc_on_planted_duplicates(spark, tmp_path):
    """dedup_keep_best_doc returns 0 rows on the dup-free driver
    corpus, so its hash-green driver row is trivially 0≡0; this test
    supplies the NON-empty evidence: planted exact-dup groups (incl.
    whitespace/case variants that must normalize together), keep-best
    = longest text then smallest doc_id, differential vs the oracle
    on the same planted table."""
    import duckdb

    from ex9_big_data_gal_drimer_spark.plans import ORACLES, QUERIES

    rows = [
        # group A: 3 copies (one case variant, one extra-space variant)
        (1, "alpha beta gamma", "en", "src0", 16),
        (2, "Alpha  Beta   GAMMA", "en", "src1", 19),
        (3, "alpha beta gamma", "en", "src2", 16),
        # group B: 2 copies, equal length -> min doc_id wins
        (4, "delta epsilon", "en", "src0", 13),
        (5, "DELTA EPSILON", "en", "src1", 13),
        # singleton: must NOT appear
        (6, "zeta eta theta", "en", "src0", 14),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = QUERIES["dedup_keep_best_doc"](spark, sf_dir).collect()
    assert len(got) == 2
    by_copies = {r.n_copies: r for r in got}
    # group A: 3 copies, longest text is doc 2 (19 chars)
    assert by_copies[3].keep_doc_id == 2 and by_copies[3].keep_n_chars == 19
    # group B: tie on length -> smallest doc_id
    assert by_copies[2].keep_doc_id == 4 and by_copies[2].keep_n_chars == 13

    con = duckdb.connect()
    # Spark writes a directory; DuckDB needs the part-file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    want = con.execute(ORACLES["dedup_keep_best_doc"]).fetchall()
    assert sorted(tuple(r) for r in got) == sorted(want)
