"""Normalize stage: spans → comparable features, order-preserving.

Parity: the reference normalizes each media document at ingest (lowercase /
strip title + artist, compute thumbnail pHash) before anything else touches
it (``mediachain/indexer/mc_ingest.py``).  Spark-first: one narrow
whole-stage-codegen projection — higher-order array functions over the spans
struct, no shuffle, no Python.

Per-row invariant (BASELINE.json input_hint): span-sequence equality
``(kind, text, media_ref, order)`` — span order is defined by ``offset``,
and normalization must never reorder or drop spans on the preserved output.
``span_signature`` is the canonical witness used by the property tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mediachain_indexer_spark.functions.phash import phash_of_media_ref
from mediachain_indexer_spark.functions.text import norm_text

_FS = chr(31)  # field separator in the span signature
_NULL = chr(30)  # null sentinel — cannot appear in real span values


def sorted_spans(spans: Column | str = "spans") -> Column:
    """Spans in offset order — array_sort on a struct with offset first.

    Sorting struct(offset, kind, text, media_ref) orders by offset (struct
    comparison is field-by-field), then fields are projected back in the
    declared span shape.
    """
    c = F.col(spans) if isinstance(spans, str) else spans
    by_offset = F.array_sort(
        F.transform(
            c,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    return F.transform(
        by_offset,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )


def span_signature(spans: Column | str = "spans") -> Column:
    """Canonical per-row witness of (kind, text, media_ref, order).

    Equal signatures ⇔ equal span sequences.  Null-safe: nulls are encoded
    as a sentinel that cannot collide with real values.
    """
    return F.transform(
        sorted_spans(spans),
        lambda s: F.concat_ws(
            _FS,
            F.coalesce(s["kind"], F.lit(_NULL)),
            F.coalesce(s["text"], F.lit(_NULL)),
            F.coalesce(s["media_ref"], F.lit(_NULL)),
        ),
    )


def normalize_documents(df: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → (doc_id, spans, norm_text, phashes).

    - ``spans``: preserved, re-ordered by offset (content untouched);
    - ``norm_text``: all text spans in offset order, normalized, joined by a
      single space — the input to shingling / MinHash / string scoring;
    - ``phashes``: array<long> of 64-bit perceptual hashes of the media
      spans, offset order preserved.

    Narrow (no shuffle); nested-schema pruning lets downstream stages that
    only need ``norm_text`` skip reading media_ref bytes entirely.
    """
    spans = sorted_spans("spans")
    text_concat = F.concat_ws(
        " ",
        F.transform(
            F.filter(spans, lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
    )
    phashes = F.transform(
        F.filter(
            spans,
            lambda s: (s["kind"] == F.lit("media")) & s["media_ref"].isNotNull(),
        ),
        lambda s: phash_of_media_ref(s["media_ref"]),
    )
    return df.select(
        F.col("doc_id"),
        spans.alias("spans"),
        norm_text(text_concat).alias("norm_text"),
        phashes.alias("phashes"),
    )
