"""Text analysis for training-data pipelines over ``documents``-shaped tables.

All hot paths are JVM-side Catalyst expressions (no Python): token counting,
quality ratios, fingerprints. Language ID uses a tiny stopword n-gram
heuristic as a single built-in-functions expression. These are the
text-quality primitives a 100 TB pretraining pipeline runs in its filter
stage; everything here is a narrow projection over pushed-down columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Top stopwords per language for the heuristic language scorer.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "una"],
}


def token_count(col: Column | str) -> Column:
    """Whitespace token count, JVM-side: size(split(trim(text), '\\s+'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-like sub-token estimate: words + digit runs + punctuation marks,
    via a tokenizing regex — the standard cheap proxy for tokenizer cost."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(toks)


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / F.length(c).cast("double")
    )


def uppercase_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        upper.cast("double") / F.length(c).cast("double")
    )


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are (lang) stopwords — JVM-side via array ops."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    stops = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
    # F.filter counts duplicate hits (array_intersect would dedup)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.size(F.filter(toks, lambda t: F.array_contains(stops, t))).cast("double")
        / F.size(toks).cast("double")
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punct, low caps,
    some stopwords. Mirrors the Gopher/C4-style rule-based filters."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    length_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) < 0.3, 1.0).otherwise(0.0)
    caps_ok = F.when(uppercase_ratio(c) < 0.3, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(c) > 0.01, 1.0).otherwise(0.0)
    return (length_ok + punct_ok + caps_ok + stop_ok) / F.lit(4.0)


def detect_language(col: Column | str) -> Column:
    """Pick the language whose stopword markers hit most tokens; 'und'
    (undetermined) when nothing hits. Single Catalyst expression."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    scores = []
    for lang, words in _LANG_MARKERS.items():
        stops = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(stops, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """64-bit document fingerprint over normalized text (xxhash64 of the
    whitespace-collapsed, lowercased body) — exact-dup key at scale."""
    c = F.col(col) if isinstance(col, str) else col
    # NULL text folds to '' so a dirty corpus row groups deterministically
    # instead of propagating a null key
    normalized = F.regexp_replace(F.lower(F.trim(F.coalesce(c, F.lit("")))), r"\s+", " ")
    return F.xxhash64(normalized)


def rolling_shingle_hashes(col: Column | str, k: int = 5) -> Column:
    """Array of xxhash64 values over k-word shingles (document fingerprinting
    / minhash substrate). Built-ins only: split -> transform windows -> hash."""
    c = F.col(col) if isinstance(col, str) else col
    # NULL-safe: split/transform over a null string yields a null array,
    # which would crash the downstream numpy consumers (minhash signatures)
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.coalesce(c, F.lit("")))), r"\s+", " "), " "
    )
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.xxhash64(F.concat_ws(" ", toks)))).otherwise(
        F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k)))
        )
    )


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection used by the pipeline queries()."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        punct_ratio(text_col).alias("punct_ratio"),
        quality_score(text_col).alias("quality"),
        detect_language(text_col).alias("lang_guess"),
        fingerprint(text_col).alias("fingerprint"),
    )
