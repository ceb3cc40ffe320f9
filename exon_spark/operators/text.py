"""Text-analysis operators for training-data pipelines: quality statistics,
language identification, token counting, document fingerprinting.

All pure Column expressions (JVM-side). Oracle-mirrorable: every formula
reproduces in DuckDB SQL (see queries/pipeline.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from exon_spark.operators.dedup import h32, tokens

STOPWORDS_EN = ("the", "and", "of", "is", "was", "a", "to", "in")

# tiny marker-word sets for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "was"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "et", "est", "une"),
    "zh": ("的", "是", "了", "在", "我"),
}
_LANG_ORDER = ("en", "es", "de", "fr", "zh")  # deterministic argmax tie-break


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def text_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality stats: token counts (whitespace + BPE-ish),
    average token length, punctuation ratio, stopword ratio."""
    t = F.col(text_col)
    toks = tokens(text_col, lowercase=True)
    n_tok = F.size(toks)
    tok_len_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
    )
    n_chars = F.length(t)
    n_nonpunct = F.length(F.regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
    bpe_tokens = F.size(
        F.regexp_extract_all(t, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), 0)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("int").alias("n_tokens"),
        bpe_tokens.cast("int").alias("n_bpe_tokens"),
        F.round(tok_len_sum.cast("double") / n_tok, 6).alias("avg_token_len"),
        F.round((n_chars - n_nonpunct).cast("double") / n_chars, 6).alias(
            "punct_ratio"
        ),
        F.round(
            _count_in(toks, STOPWORDS_EN).cast("double") / n_tok, 6
        ).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID: per-language marker counts, argmax with the
    fixed precedence en > es > de > fr > zh."""
    toks = tokens(text_col, lowercase=True)
    scores = {lang: _count_in(toks, LANG_MARKERS[lang]) for lang in _LANG_ORDER}
    guess = None
    # argmax with precedence: lang wins iff its score >= every later lang's
    # score and > every earlier lang's score (strictly handled by ordering)
    expr = F.lit(_LANG_ORDER[-1])
    for lang in reversed(_LANG_ORDER[:-1]):
        cond = None
        for other in _LANG_ORDER:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    guess = expr
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[scores[lang].cast("int").alias(f"s_{lang}") for lang in _LANG_ORDER],
        guess.alias("lang_guess"),
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", window: int = 8
) -> DataFrame:
    """Document fingerprints: md5 of the normalized text plus the minimum
    rolling window hash (winnowing-style robust fingerprint)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    d = df.select(F.col(id_col).alias("doc_id"), norm.alias("norm"))
    wins = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length("norm") - (window - 1), F.lit(1))
        ),
        lambda i: F.substring(F.col("norm"), i, window),
    )
    return d.select(
        "doc_id",
        F.md5("norm").alias("fingerprint"),
        F.array_min(F.transform(wins, lambda w: h32(w))).alias("min_window_hash"),
    )


# Regexes chosen for identical semantics under Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround, leftmost-first alternation.
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_phones": r"\(\d{3}\) \d{3}-\d{4}|\d{3}-\d{3}-\d{4}",
    "n_ssns": r"\d{3}-\d{2}-\d{4}",
    "n_ips": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}


def pii_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII signal counts (emails, phone numbers, SSN-shaped
    ids, IPv4 addresses) + a has_pii flag — the redaction/filter pass every
    training-data pipeline runs before release. Pure Column expressions
    (JVM regexp_count, whole-stage codegen): no shuffle, no Python.

    Counts are independent per pattern (an SSN-shaped string also matches
    nothing else here; phone/SSN differ in group sizes). Output:
    (doc_id, n_emails, n_phones, n_ssns, n_ips, has_pii).
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).alias(name)
        for name, p in PII_PATTERNS.items()
    ]
    out = df.select(F.col(id_col).alias("doc_id"), *counts)
    total = None
    for name in PII_PATTERNS:
        c = F.col(name)
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)
