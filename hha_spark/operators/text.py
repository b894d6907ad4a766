"""Text-analysis operators: statistics, language ID, quality scoring,
fingerprinting, token counting.

All JVM-side (built-in functions only — no Python UDFs in any hot
path), so every operator stays inside whole-stage codegen and scales
as a narrow map + optional aggregate.

Cross-engine determinism: counts and lengths are integers; ratios are
single divisions of exact integers (correctly rounded doubles,
identical everywhere); classifications are CASE over integer
comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in"],
    "es": ["el", "la", "de", "los", "las", "y"],
    "de": ["der", "die", "das", "und", "ein"],
    "fr": ["le", "les", "des", "et", "un"],
}

WORD_RE = "[a-z0-9]+"


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def text_stats(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token/char statistics.

    mean_token_len relies on single-space separation:
    chars_in_tokens = len(text) - (n_tokens - 1).
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        n_chars.alias("n_chars"),
        ((n_chars - (n_tokens - F.lit(1))) / n_tokens).alias("mean_token_len"),
    )


def language_id(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language guess (deterministic argmax, fixed
    precedence en > es > de > fr > unknown)."""
    hits = {}
    for lang, words in STOPWORDS.items():
        in_list = ", ".join(f"'{w}'" for w in words)
        hits[lang] = F.expr(
            f"size(filter(split({text_col}, ' '), t -> t IN ({in_list})))"
        )
    guess = (
        F.when(
            (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["fr"]) & (hits["en"] > 0), "en")
        .when((hits["es"] >= hits["de"]) & (hits["es"] >= hits["fr"])
              & (hits["es"] > 0), "es")
        .when((hits["de"] >= hits["fr"]) & (hits["de"] > 0), "de")
        .when(hits["fr"] > 0, "fr")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col),
        *[hits[lang].alias(f"hits_{lang}") for lang in STOPWORDS],
        guess.alias("lang_guess"),
    )


def quality_score(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Integer quality score + class.

    +1 length in a sane band, +1 lexical diversity (distinct/total
    >= 0.3, tested as 10*distinct >= 3*total), +1 contains a common
    function word. Class: 3 -> high, 2 -> medium, else low.
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    score = (
        F.when((n_tokens >= 20) & (n_tokens <= 400), 1).otherwise(0)
        + F.when(F.lit(10) * n_distinct >= F.lit(3) * n_tokens, 1).otherwise(0)
        + F.when(F.array_contains(toks, "the"), 1).otherwise(0)
    )
    return (
        df.select(F.col(id_col), score.alias("quality_score"))
        .withColumn(
            "quality_class",
            F.when(F.col("quality_score") >= 3, "high")
            .when(F.col("quality_score") == 2, "medium")
            .otherwise("low"),
        )
    )


def fingerprint(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase
    text, plus the 16-hex-char short form used for sharded lookup."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp"),
        F.substring(F.md5(norm), 1, 16).alias("fp16"),
    )


def token_count_regex(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """BPE-ish token counting: alnum runs extracted by regex (a
    portable stand-in for a real tokenizer's pre-tokenization)."""
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), 0)).alias(
            "n_word_tokens"
        ),
    )
