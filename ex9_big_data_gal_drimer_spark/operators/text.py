"""Text-analysis operators (SURVEY.md §2.11 X4): tokenization flavors,
quality scoring, n-gram language identification.

All pure column expressions / DataFrame compositions.  The language
identifier is the classic profile method: learn per-language token
log-probabilities from labeled data, score unlabeled docs by joined
token weights, argmax per doc — train and predict are both single
shuffle-bounded DataFrame jobs, no model object, no UDF, usable at
any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import tokens

#: BPE-ish unit pattern: alnum runs OR single non-alnum-non-space
#: (approximates byte-pair pre-tokenization; reference seed is the
#: comma-count idiom, main.py:116).
BPE_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"

#: Tiny English stopword set for quality heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def bpe_token_count(col: Column) -> Column:
    """# of BPE-ish units in lowercased text."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_PATTERN), 0))


def stopword_ratio(col: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks))


def nonalnum_ratio(col: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased)."""
    return F.when(
        F.length(col) > 0,
        F.length(F.regexp_replace(F.lower(col), "[a-z0-9 ]", "")).cast("double")
        / F.length(col),
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length saturation +
    cleanliness + stopword naturalness (standard pre-training gate
    shape; weights are illustrative and documented)."""
    n_tokens = F.size(tokens(col))
    length_term = F.least(F.lit(1.0), n_tokens.cast("double") / 100.0)
    clean_term = 1.0 - F.coalesce(nonalnum_ratio(col), F.lit(1.0))
    stop_term = F.least(F.lit(1.0), F.coalesce(stopword_ratio(col), F.lit(0.0)) * 5.0)
    return F.round(0.4 * length_term + 0.3 * clean_term + 0.3 * stop_term, 4)


def distinct_token_ratio(tokens_col: Column) -> Column:
    """Type-token ratio: |distinct tokens| / |tokens| — the simplest
    repetition signal (Gopher-style repetition filters gate on it;
    word-salad spam scores low)."""
    return F.when(
        F.size(tokens_col) > 0,
        F.size(F.array_distinct(tokens_col)).cast("double") / F.size(tokens_col),
    )


def dup_bigram_fraction(tokens_col: Column) -> Column:
    """Fraction of word bigrams that are repeats of an earlier bigram
    (1 - distinct/total).  NULL for docs under 2 tokens.  Pure array
    expressions — computed map-side during the scan."""
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - 1),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i, 2)),
    )
    return F.when(
        F.size(tokens_col) >= 2,
        1.0 - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams),
    )


def lang_id_train(
    labeled: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Learn per-(lang, token) weights from labeled docs.

    Weight = log((count(token in lang) + 1) / (tokens in lang + V)) —
    add-one-smoothed unigram log-likelihood.  Output: (lang, token,
    weight) — a small profile table, broadcastable at predict time.
    """
    tok = labeled.select(
        F.col(lang_col).alias("lang"), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.trim("token") != "")
    counts = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    totals = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_total"))
    vocab = tok.select("token").distinct().count()
    return (
        counts.join(totals, "lang")
        .select(
            "lang",
            "token",
            F.log(
                (F.col("n") + 1.0) / (F.col("lang_total") + F.lit(float(vocab)))
            ).alias("weight"),
        )
    )


def lang_id_predict(
    docs: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each doc against every language profile; argmax wins.

    Unknown tokens contribute nothing (inner join drops them) — the
    smoothing already lives in the trained weights.  The profile side
    is broadcast: it is vocabulary-sized, not corpus-sized.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.trim("token") != "")
    scored = (
        tok.join(F.broadcast(profiles), "token")
        .groupBy("doc_id", "lang")
        .agg(F.sum("weight").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "lang")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("lang").alias("predicted_lang"), "score")
    )
