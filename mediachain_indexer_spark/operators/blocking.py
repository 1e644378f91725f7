"""Blocking stage: documents → (block_key, doc_id) candidate buckets.

Parity: the reference's baseline dedupe model looks up candidates by exact
perceptual-hash term match, and its next-gen model by multi-band substrings
of the binary hash so near-duplicates collide in ≥1 band
(``mediachain/indexer/mc_models.py`` baseline / baseline_ng,
``mc_dedupe.py``).  Spark-first rebuild with three key families, all
generated in one narrow projection + one ``explode``:

- ``e:``  exact-text key — xxhash64 of the normalized text (catches verbatim
          duplicates for the cost of one hash);
- ``t<b>:`` MinHash-LSH band keys over character-shingle signatures
          (functions/minhash.py) — near-duplicate *text*;
- ``p<b>:`` perceptual-hash band keys: each 64-bit pHash split into
          ``PHASH_BANDS`` 16-bit substrings (band 0 is the hash *prefix*
          bucket) — near-duplicate *media* within a small Hamming radius
          collides in ≥1 band unless every differing bit lands in a distinct
          band.

Scale: the output shuffle is partitioned by ``block_key`` downstream
(operators/pairs.py), which also applies the size cap and salting.  Block
cardinality ~ docs × (1 + bands + media_bands), all narrow until the
pair-join shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediachain_indexer_spark.functions.minhash import (
    lsh_band_keys,
    make_minhash_udf,
    minhash_signature,
)

PHASH_BANDS = 4
PHASH_BAND_BITS = 64 // PHASH_BANDS


@dataclass(frozen=True)
class BlockingConfig:
    minhash_bands: int = 16
    minhash_rows: int = 4  # signature length = bands * rows
    shingle_n: int = 3
    seed: int = 42
    use_exact_text_key: bool = True
    # vectorized numpy pandas_udf (hot path) vs pure-JVM HOF expression
    # (reference implementation; interpreted lambda eval — slow at scale)
    jvm_minhash: bool = False

    @property
    def num_hashes(self) -> int:
        return self.minhash_bands * self.minhash_rows


def phash_band_keys(phashes_col) -> "F.Column":
    """array<string> of band keys for every phash in an array<long> column.

    Band b = bits [64 - (b+1)*16, 64 - b*16) via arithmetic shift + mask;
    key = 'p<b>:<band value>'.  Pure JVM bit ops.
    """
    keys_per_hash = []
    for b in range(PHASH_BANDS):
        shift = 64 - (b + 1) * PHASH_BAND_BITS
        keys_per_hash.append(
            lambda h, b=b, shift=shift: F.concat(
                F.lit(f"p{b}:"),
                F.shiftrightunsigned(h, shift)
                .bitwiseAND(F.lit((1 << PHASH_BAND_BITS) - 1))
                .cast("string"),
            )
        )
    return F.flatten(
        F.transform(
            phashes_col,
            lambda h: F.array(*[k(h) for k in keys_per_hash]),
        )
    )


def build_blocks(norm_df: DataFrame, cfg: BlockingConfig = BlockingConfig()) -> DataFrame:
    """(doc_id, norm_text, phashes) → (block_key, doc_id), distinct.

    One projection computes every key family into a single array column, one
    ``explode`` flattens it — Catalyst keeps this in a single codegen stage
    up to the downstream shuffle.
    """
    if cfg.jvm_minhash:
        sig_expr = minhash_signature(
            F.col("norm_text"), cfg.num_hashes, cfg.shingle_n, cfg.seed
        )
    else:
        sig_expr = make_minhash_udf(cfg.num_hashes, cfg.shingle_n, cfg.seed)(
            F.col("norm_text")
        )
    # project the signature once before fanning out into band keys
    norm_df = norm_df.select(
        "doc_id", "norm_text", "phashes", sig_expr.alias("minhash_sig")
    )
    sig = F.col("minhash_sig")
    text_keys = F.when(
        sig.isNotNull(),
        lsh_band_keys(sig, cfg.minhash_bands, cfg.minhash_rows),
    ).otherwise(F.array().cast("array<string>"))

    media_keys = F.when(
        F.col("phashes").isNotNull(), phash_band_keys(F.col("phashes"))
    ).otherwise(F.array().cast("array<string>"))

    families = [text_keys, media_keys]
    if cfg.use_exact_text_key:
        exact_key = F.when(
            F.col("norm_text").isNotNull() & (F.length("norm_text") > 0),
            F.array(F.concat(F.lit("e:"), F.xxhash64("norm_text").cast("string"))),
        ).otherwise(F.array().cast("array<string>"))
        families.append(exact_key)

    keys = F.concat(*families)
    return (
        norm_df.select(F.col("doc_id"), F.explode(keys).alias("block_key"))
        .select("block_key", "doc_id")
        .dropDuplicates(["block_key", "doc_id"])
    )
