"""Blocking + pair generation: recall oracle (brute force on 500 docs),
cap/salt invariants, cross-band dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediachain_indexer_spark.operators.blocking import BlockingConfig, build_blocks
from mediachain_indexer_spark.operators.normalize import normalize_documents
from mediachain_indexer_spark.operators.pairs import PairsConfig, candidate_pairs
from mediachain_indexer_spark.plans.eval import blocking_recall


def test_blocking_recall_on_labeled_pairs(spark, docs500, labels500):
    """Every (well, ≥99.5% of) true-match pair must share ≥1 block key."""
    feats = normalize_documents(docs500)
    blocks = build_blocks(feats)
    assert blocking_recall(labels500, blocks) >= 0.995


def test_blocks_shape(spark, docs500):
    blocks = build_blocks(normalize_documents(docs500))
    assert blocks.columns == ["block_key", "doc_id"]
    # distinct (block_key, doc_id)
    assert blocks.count() == blocks.dropDuplicates(["block_key", "doc_id"]).count()
    # all three key families present
    fams = {
        r["fam"]
        for r in blocks.select(F.substring("block_key", 1, 1).alias("fam")).distinct().collect()
    }
    assert fams == {"e", "t", "p"}


def test_pairs_canonical_and_unique(spark, docs500):
    blocks = build_blocks(normalize_documents(docs500))
    pairs = candidate_pairs(blocks)
    n = pairs.count()
    assert pairs.where(F.col("doc_a") >= F.col("doc_b")).count() == 0
    assert pairs.dropDuplicates(["doc_a", "doc_b"]).count() == n


def test_salted_path_equals_plain_path(spark, docs500):
    """Forcing every block through the salted triangle join must produce
    exactly the same pair set as the plain self-join."""
    blocks = build_blocks(normalize_documents(docs500))
    plain = candidate_pairs(blocks, PairsConfig(salt_threshold=10**9))
    salted = candidate_pairs(blocks, PairsConfig(salt_threshold=1, n_salts=4))
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_size_cap_bounds_block_contribution(spark):
    """A block of n docs capped at K contributes at most C(K,2) pairs."""
    rows = [("hot", f"d{i:03d}") for i in range(50)]
    blocks = spark.createDataFrame(rows, "block_key string, doc_id string")
    pairs = candidate_pairs(blocks, PairsConfig(max_block_size=10, salt_threshold=4, n_salts=3))
    assert pairs.count() == 45  # C(10,2)


def test_cap_is_deterministic(spark):
    rows = [("hot", f"d{i:03d}") for i in range(50)]
    blocks = spark.createDataFrame(rows, "block_key string, doc_id string")
    cfg = PairsConfig(max_block_size=10)
    a = sorted(map(tuple, candidate_pairs(blocks, cfg).collect()))
    b = sorted(map(tuple, candidate_pairs(blocks, cfg).collect()))
    assert a == b
