"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all pure JVM column expressions over a flat text
table (training-data-pipeline tier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mediachain_indexer_spark.functions.text import norm_text, tokens

# tiny seeded stopword profiles (n-gram heuristic tier — not a model)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "is"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "que", "los", "es"),
}


def _marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    padded = F.concat(F.lit(" "), norm_text(text), F.lit(" "))
    hits = F.lit(0)
    for m in markers:
        # count occurrences of " m " — size(split)-1, overlap-free
        hits = hits + F.size(F.split(padded, f" {m} ")) - 1
    return hits


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword-marker hit counts."""
    cols = [
        _marker_hits(F.col(text_col), m).alias(f"hits_{lang}")
        for lang, m in LANG_MARKERS.items()
    ]
    d = docs.select("doc_id", *cols)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return d.select("doc_id", pred.alias("pred_lang"), best.alias("marker_hits"))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (len/4 per token, ≥1)."""
    toks = tokens(F.col(text_col))
    subwords = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.greatest(F.ceil(F.length(t) / 4).cast("int"), F.lit(1)),
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        subwords.alias("n_subword_est"),
        F.length(text_col).alias("n_chars"),
    )


def rolling_fingerprint(docs: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: min rolling-window hash over the
    normalized text's shingles (one stable 64-bit id per doc)."""
    normed = norm_text(F.col(text_col))
    shingle_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(normed) - window, F.lit(0))),
        lambda i: F.xxhash64(normed.substr(i + F.lit(1), F.lit(window))),
    )
    return docs.select(
        "doc_id",
        F.array_min(shingle_hashes).alias("fingerprint"),
        F.array_max(shingle_hashes).alias("fingerprint_hi"),
    )
