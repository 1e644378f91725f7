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
    """Whitespace tokens + a BPE-ish subword proxy (len/4 per token, ≥1).

    Pure whole-stage-codegen arithmetic — no lambda / interpreted HOF in
    the plan (the round-3 formulation ran an ``aggregate`` HOF per token,
    the one remaining interpreted hot-ish path at 10¹² docs):

    - ``norm_text`` emits tokens separated by exactly one space and trims,
      so ``n_tokens = #spaces + 1``;
    - ``Σ max(ceil(len_i/4), 1) = regexp_count(t, '[a-z0-9]{1,4}')``: the
      greedy non-overlapping matcher consumes ≤4 alphabet chars at a time
      and cannot cross a space, so it restarts per token — exactly
      ``ceil(len_i/4)`` matches per token (the ``max(·,1)`` only binds for
      the empty-string token, which after trim occurs only as the lone
      token of empty text — the CASE below);
    - empty normalized text: ``split`` yields ``[""]`` → both counts are 1
      (bit-compatible with the HOF formulation and the DuckDB oracle).
    """
    t = norm_text(F.col(text_col))
    n_norm = F.length(t)
    n_tok = F.when(n_norm == 0, F.lit(1)).otherwise(
        (F.regexp_count(t, F.lit(" ")) + 1).cast("int")
    )
    subwords = F.when(n_norm == 0, F.lit(1)).otherwise(
        F.regexp_count(t, F.lit("[a-z0-9]{1,4}")).cast("int")
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        subwords.alias("n_subword_est"),
        F.length(text_col).alias("n_chars"),
    )


def rolling_fingerprint(
    docs: DataFrame, text_col: str = "text", window: int = 8, impl: str = "numpy"
) -> DataFrame:
    """Winnowing-style fingerprint: min/max rolling-window hash over the
    normalized text's character shingles (one stable 64-bit id per doc).

    ``impl="numpy"`` (default): a true O(len) rolling polynomial hash over
    the whole Arrow batch — ``window`` shifted multiply-adds on a
    (batch, maxlen) uint64 code matrix, then an avalanche mix and a masked
    min/max per row.  The ``"jvm"`` reference is the round-1 formulation
    (per-position HOF + xxhash64 per shingle — interpreted per element).
    Measured at 100k docs × ~1.4k chars (local[32], min/max-agg consumer so
    nothing prunes): jvm 265.7s vs numpy 3.66s — **73×**; short driver docs
    hide the gap, long documents are exactly where a fingerprint runs at
    web scale.  The two impls hash differently by construction; both are
    deterministic, and the operator contract is "stable 64-bit content id",
    not a specific hash family.
    """
    if impl == "jvm":
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

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType, StructField, StructType

    B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier (mod 2^64 ring)

    def _mix(x: "np.ndarray") -> "np.ndarray":
        # xorshift-multiply avalanche (splitmix64 finalizer)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def fp_batch(s):
        s = s.fillna("")
        n = len(s)
        if n == 0:
            return pd.DataFrame({"fingerprint": [], "fingerprint_hi": []})
        width = max(int(s.str.len().max()), window)
        arr = np.asarray(s.to_numpy(), dtype=f"U{width}")
        codes = arr.view(np.uint32).reshape(n, width).astype(np.uint64)
        lens = (codes != 0).sum(axis=1)
        n_win = width - window + 1
        with np.errstate(over="ignore"):
            H = np.zeros((n, n_win), dtype=np.uint64)
            for j in range(window):  # window shifted multiply-adds, not per-char python
                H = H * B + codes[:, j : j + n_win]
            H = _mix(H)
        # valid windows: start + window <= len (min one window per doc)
        starts = np.arange(n_win, dtype=np.int64)[None, :]
        valid = starts <= np.maximum(lens - window, 0)[:, None]
        lo = np.where(valid, H, np.uint64(0xFFFFFFFFFFFFFFFF)).min(axis=1)
        hi = np.where(valid, H, np.uint64(0)).max(axis=1)
        return pd.DataFrame(
            {
                "fingerprint": lo.astype(np.int64),
                "fingerprint_hi": hi.astype(np.int64),
            }
        )

    out_type = StructType(
        [
            StructField("fingerprint", LongType()),
            StructField("fingerprint_hi", LongType()),
        ]
    )
    fp_udf = pandas_udf(fp_batch, returnType=out_type)
    return docs.select(
        "doc_id", fp_udf(norm_text(F.col(text_col))).alias("fp")
    ).select("doc_id", "fp.fingerprint", "fp.fingerprint_hi")
