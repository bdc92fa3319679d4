"""Text-analysis operators for training-data pipelines (north star:
language-ID, quality scoring, token counting, document fingerprinting).

Everything is built-in expressions (rlike / split / aggregate / md5) so the
hot path stays JVM-side and the DuckDB oracles can mirror it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the rule-based lang-ID heuristic
LANG_MARKERS: dict[str, str] = {
    # regex alternations; POSIX-simple so Java and RE2 dialects agree
    "zh": "[\\u4e00-\\u9fff]",
    "fr": "(^| )(le|la|les|et|des|une?)( |$)",
    "es": "(^| )(el|los|las|y|una?)( |$)",
    "de": "(^| )(der|die|das|und|eine?)( |$)",
}


def lang_id(text: Column) -> Column:
    """Rule-based language guess: first matching marker wins, else 'en'.
    (A character/stopword heuristic — deterministic, oracle-expressible.)"""
    expr = F.when(text.rlike(LANG_MARKERS["zh"]), "zh")
    for lang in ("fr", "es", "de"):
        expr = expr.when(text.rlike(LANG_MARKERS[lang]), lang)
    return expr.otherwise("en")


STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality signals: length, word stats, stopword/digit/
    punctuation ratios — the standard cheap pre-filter for LLM corpora."""
    toks = F.split(text, " ")
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    n_digit = (n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(text, "[.,;:!?]", ""))
    ).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": (n_chars - (n_tokens - 1)) / n_tokens,
        "stopword_ratio": n_stop / n_tokens,
        "digit_ratio": n_digit / n_chars,
        "punct_ratio": n_punct / n_chars,
    }


def token_counts(text: Column) -> dict[str, Column]:
    """Whitespace token count + a BPE-ish subword estimate (pieces of ≤4
    chars per word, the usual chars/4 heuristic refined per token)."""
    toks = F.split(text, " ")
    return {
        "n_ws_tokens": F.size(toks),
        "n_subword_est": F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int"),
        ),
    }


def bow_fingerprint(text: Column) -> Column:
    """Bag-of-words document fingerprint: md5 over the sorted distinct token
    set — invariant to token order/multiplicity (near-dup pre-key)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(F.split(text, " "))), " "))


def rolling_hash(text: Column, base: int = 31, mod: int = 2**31 - 1) -> Column:
    """Polynomial rolling hash over characters (ascii), h = h*base + c mod m
    — the building block for content-defined chunking. Pure fold."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % F.lit(mod),
    )
