"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure JVM expressions (``pyspark.sql.functions``) — no Python in the hot
path; each scales as a narrow map over the documents scan with full
column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic
#: (public common-word lists; deliberately small — this is a heuristic)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def token_count(col: Column | str, out: str = "n_tokens") -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return (
        F.when(F.length(trimmed) == 0, F.lit(0).cast("long"))
        .otherwise(F.size(F.split(trimmed, r"\s+")).cast("long"))
        .alias(out)
    )


def bpe_ish_token_count(col: Column | str, out: str = "n_bpe_tokens") -> Column:
    """BPE-ish proxy: count word pieces + digits + punctuation as separate
    tokens via a regex split (deterministic, tokenizer-free)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]|[^A-Za-z0-9\s])"), 1)
    return F.size(pieces).cast("long").alias(out)


def text_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality signals
    (the web-corpus-filtering analog of the reference's per-record quality
    sentinels, extract_mhealthtools_tremor_features_mpower1.R:416-420)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tok = token_count(text_col, "n_tokens")
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[.!?,;:]", ""))
    spaces = F.length(t) - F.length(F.regexp_replace(t, r" ", ""))
    stop_hits = sum(
        (
            F.size(F.regexp_extract_all(F.lower(t), F.lit(rf"\b({w})\b"), 1))
            for ws in LANG_MARKERS.values()
            for w in ws
        ),
        F.lit(0),
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_f"),
        n_tok,
        punct.cast("long").alias("n_punct"),
        (punct.cast("double") / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (spaces.cast("double") / F.greatest(n_chars, F.lit(1))).alias("space_ratio"),
        stop_hits.cast("long").alias("n_stopword_hits"),
    )


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language marker-word hit
    counts, 'und' (undetermined) when all are zero."""
    t = F.lower(F.col(text_col))
    scores = {
        lang: sum(
            (F.size(F.regexp_extract_all(t, F.lit(rf"\b({w})\b"), 1)) for w in ws),
            F.lit(0),
        )
        for lang, ws in LANG_MARKERS.items()
    }
    pairs = F.array(
        *[F.struct(s.cast("long").alias("score"), F.lit(l).alias("lang"))
          for l, s in scores.items()]
    )
    best = F.array_max(pairs)
    return df.withColumn(
        out, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def fingerprint(col: Column | str, out: str = "fingerprint") -> Column:
    """Normalized-content fingerprint: md5 of lowercase, whitespace-squished
    text (stable across engines; used for exact dedup)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")).alias(out)


def word_shingles(
    col: Column | str, k: int = 5, out: str = "shingles"
) -> Column:
    """k-word shingle STRINGS (space-joined k-grams of the lowercased,
    whitespace-split text; the whole text when shorter than k words).
    The unhashed twin of :func:`rolling_hash_shingles` — portable to any
    engine, used where an exact cross-engine oracle is needed."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return (
        F.when(n < k, F.array(F.concat_ws(" ", words)))
        .otherwise(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
        )
        .alias(out)
    )


def rolling_hash_shingles(
    col: Column | str, k: int = 5, out: str = "shingles"
) -> Column:
    """k-word shingle hashes (xxhash64 of each k-gram) — the document
    fingerprint set for Jaccard/MinHash."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return (
        F.when(n < k, F.array(F.xxhash64(F.concat_ws(" ", words))))
        .otherwise(
            F.transform(
                idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k)))
            )
        )
        .alias(out)
    )
