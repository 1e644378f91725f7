"""Per-block applyInPandas scoring fallback vs the join path (SURVEY §2.2).

Contract: identical ``is_match`` decisions (the join path's cascade gates
are decision-invariant by construction, so the exact-scoring fallback must
agree bit-for-bit on every pair), and identical pair coverage when no block
exceeds the cap."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mediachain_indexer_spark.functions.simtext import levenshtein_batch
from mediachain_indexer_spark.operators.blocking import build_blocks
from mediachain_indexer_spark.operators.normalize import normalize_documents
from mediachain_indexer_spark.operators.pairs import candidate_pairs
from mediachain_indexer_spark.operators.scoring import (
    score_pairs,
    score_pairs_in_blocks,
)


def _ref_lev(s1: str, s2: str) -> int:
    d = list(range(len(s2) + 1))
    for i in range(1, len(s1) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(s2) + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (s1[i - 1] != s2[j - 1]))
            prev = cur
    return d[len(s2)]


def test_levenshtein_batch_matches_scalar():
    import random

    rng = random.Random(3)
    a = ["".join(rng.choice("abcd ") for _ in range(rng.randint(0, 25))) for _ in range(200)]
    b = ["".join(rng.choice("abcd ") for _ in range(rng.randint(0, 25))) for _ in range(200)]
    a += ["", "abc", ""]
    b += ["", "", "xy"]
    got = levenshtein_batch(pd.Series(a), pd.Series(b))
    exp = np.array([_ref_lev(x, y) for x, y in zip(a, b)])
    assert (got == exp).all()


def test_grouped_matches_join_path(spark, docs500):
    feats = normalize_documents(docs500).select("doc_id", "norm_text", "phashes")
    feats = feats.persist()
    blocks = build_blocks(feats).persist()

    pairs = candidate_pairs(blocks)
    join_rows = {
        (r["doc_a"], r["doc_b"]): r["is_match"]
        for r in score_pairs(pairs, feats).collect()
    }
    grouped_rows = {
        (r["doc_a"], r["doc_b"]): r["is_match"]
        for r in score_pairs_in_blocks(blocks, feats).collect()
    }
    assert set(join_rows) == set(grouped_rows)  # same pair coverage
    diff = [k for k in join_rows if join_rows[k] != grouped_rows[k]]
    assert diff == []  # cascade gates are decision-invariant

    feats.unpersist()
    blocks.unpersist()


def test_grouped_matches_join_path_over_cap(spark):
    """Over-cap blocks: both strategies must sample EXACTLY the same members
    (shared pairs.cap_blocks xxhash64-rank rule) and emit identical pairs +
    is_match.  20 docs in one block, cap 8 → C(8,2)=28 pairs from the same
    8 sampled docs."""
    from mediachain_indexer_spark.operators.pairs import PairsConfig, cap_blocks
    from mediachain_indexer_spark.operators.scoring import ScoringConfig

    n, cap = 20, 8
    feats = spark.createDataFrame(
        [(f"d{i:02d}", f"title number {i} with shared words", [i % 4]) for i in range(n)],
        "doc_id string, norm_text string, phashes array<long>",
    )
    blocks = spark.createDataFrame(
        [("k0", f"d{i:02d}") for i in range(n)], "block_key string, doc_id string"
    )
    cfg = ScoringConfig()

    join_rows = {
        (r["doc_a"], r["doc_b"]): r["is_match"]
        for r in score_pairs(
            candidate_pairs(blocks, PairsConfig(max_block_size=cap)), feats, cfg
        ).collect()
    }
    grouped_rows = {
        (r["doc_a"], r["doc_b"]): r["is_match"]
        for r in score_pairs_in_blocks(blocks, feats, cfg, max_block_size=cap).collect()
    }
    assert len(join_rows) == cap * (cap - 1) // 2
    assert set(join_rows) == set(grouped_rows)  # identical sampled membership
    assert all(join_rows[k] == grouped_rows[k] for k in join_rows)
    # and the sampled members are the xxhash64-rank winners, not sorted-head
    kept = {
        r["doc_id"] for r in cap_blocks(blocks, cap).collect()
    }
    in_pairs = {d for k in join_rows for d in k}
    assert in_pairs == kept


def test_exact_suppression_keeps_textless_media_pairs(spark):
    """Docs with NO text co-block only via p: media bands and compare
    equal-on-empty-text — the exact-pair suppression (join path: null
    exact_hash; grouped kernel: txt == "") must NOT drop them, and both
    strategies must still match them on media alone."""
    feats = spark.createDataFrame(
        [("m1", "", [17]), ("m2", "", [17]), ("t1", "some real title here", None)],
        "doc_id string, norm_text string, phashes array<long>",
    ).persist()
    blocks = build_blocks(feats).persist()
    join_rows = {
        (r["doc_a"], r["doc_b"]): r["is_match"]
        for r in score_pairs(candidate_pairs(blocks), feats).collect()
    }
    grouped_rows = {
        (r["doc_a"], r["doc_b"]): r["is_match"]
        for r in score_pairs_in_blocks(blocks, feats).collect()
    }
    assert join_rows == {("m1", "m2"): True}
    assert grouped_rows == {("m1", "m2"): True}
    feats.unpersist()
    blocks.unpersist()


def test_grouped_pipeline_end_to_end(spark, docs500, golden500):
    from mediachain_indexer_spark.plans.pipeline import PipelineConfig, run_pipeline

    res = run_pipeline(docs500, PipelineConfig(scoring_strategy="grouped"))
    got = {r["doc_id"]: r["entity_id"] for r in res.clusters.collect()}
    assert len(got) == 500
    # same partition of docs into entities as the golden clusters
    exp_groups = {}
    for r in golden500.collect():
        exp_groups.setdefault(r["entity_id"], set()).add(r["doc_id"])
    got_groups = {}
    for d, e in got.items():
        got_groups.setdefault(e, set()).add(d)
    assert sorted(map(sorted, exp_groups.values())) == sorted(
        map(sorted, got_groups.values())
    )


def test_grouped_star_matches_join_star(spark, docs500):
    """round-4 verdict #6: grouped+star must emit the SAME pair ledger and
    is_match bits as join+star, and the same entity clusters as clique."""
    from mediachain_indexer_spark.operators.cluster import (
        attach_components,
        connected_components,
    )
    from mediachain_indexer_spark.operators.pairs import PairsConfig

    feats = normalize_documents(docs500).select(
        "doc_id", "norm_text", "phashes"
    ).persist()
    blocks = build_blocks(feats).persist()

    join_rows = {
        (r["doc_a"], r["doc_b"]): r["is_match"]
        for r in score_pairs(
            candidate_pairs(blocks, PairsConfig(exact_strategy="star")), feats
        ).collect()
    }
    grouped_rows = {
        (r["doc_a"], r["doc_b"]): r["is_match"]
        for r in score_pairs_in_blocks(
            blocks, feats, exact_strategy="star"
        ).collect()
    }
    assert set(join_rows) == set(grouped_rows)
    assert all(join_rows[k] == grouped_rows[k] for k in join_rows)

    # cluster equality vs the clique ledger (star drops within-group pair
    # ROWS, never connectivity)
    def clusters_of(rows):
        m = spark.createDataFrame(
            [(a, b) for (a, b), ok in rows.items() if ok],
            "doc_a string, doc_b string",
        )
        out = attach_components(feats, connected_components(m)).collect()
        groups = {}
        for r in out:
            groups.setdefault(r["entity_id"], set()).add(r["doc_id"])
        return {frozenset(g) for g in groups.values()}

    clique_rows = {
        (r["doc_a"], r["doc_b"]): r["is_match"]
        for r in score_pairs_in_blocks(blocks, feats).collect()
    }
    assert clusters_of(grouped_rows) == clusters_of(clique_rows)
    feats.unpersist()
    blocks.unpersist()


def test_grouped_star_uncaps_exact_groups(spark):
    """An over-cap exact-text group under star keeps ALL members (g−1 star
    edges, one cluster) in BOTH scorer strategies; clique would truncate to
    max_block_size members."""
    from mediachain_indexer_spark.operators.pairs import PairsConfig

    n, cap = 20, 8
    feats = spark.createDataFrame(
        [(f"d{i:02d}", "identical boilerplate text", [7]) for i in range(n)],
        "doc_id string, norm_text string, phashes array<long>",
    ).persist()
    blocks = build_blocks(feats).persist()

    join_star = {
        (r["doc_a"], r["doc_b"])
        for r in score_pairs(
            candidate_pairs(
                blocks, PairsConfig(max_block_size=cap, exact_strategy="star")
            ),
            feats,
        ).collect()
        if r["is_match"]
    }
    grouped_star = {
        (r["doc_a"], r["doc_b"])
        for r in score_pairs_in_blocks(
            blocks, feats, max_block_size=cap, exact_strategy="star"
        ).collect()
        if r["is_match"]
    }
    exp = {("d00", f"d{i:02d}") for i in range(1, n)}
    assert join_star == exp
    assert grouped_star == exp
    feats.unpersist()
    blocks.unpersist()
