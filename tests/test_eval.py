"""Evaluation helpers: pairwise F1 accounting and threshold grid search."""

from __future__ import annotations

from mediachain_indexer_spark.plans.eval import grid_search_thresholds, pairwise_f1


def test_pairwise_f1_counts(spark):
    labels = spark.createDataFrame(
        [("a", "b", True), ("a", "c", True), ("x", "y", False), ("p", "q", True)],
        "doc_a string, doc_b string, is_match boolean",
    )
    # blocks: everything co-blocked except (p, q)
    blocks = spark.createDataFrame(
        [("k1", "a"), ("k1", "b"), ("k1", "c"), ("k2", "x"), ("k2", "y")],
        "block_key string, doc_id string",
    )
    clusters = spark.createDataFrame(
        [("a", "e1"), ("b", "e1"), ("c", "e2"), ("x", "e3"), ("y", "e3")],
        "doc_id string, entity_id string",
    )
    m = pairwise_f1(labels, blocks, clusters)
    # eligible: (a,b)+ pred+, (a,c)+ pred-, (x,y)- pred+ ; (p,q) not co-blocked
    assert m["n_eligible"] == 3
    assert (m["tp"], m["fp"], m["fn"]) == (1, 1, 1)
    assert abs(m["f1"] - 0.5) < 1e-12


def test_grid_search_orders_by_f1(spark):
    labels = spark.createDataFrame(
        [("a", "b", True), ("c", "d", False)],
        "doc_a string, doc_b string, is_match boolean",
    )
    scored = spark.createDataFrame(
        [
            ("a", "b", 0.97, 2),  # true pair: high sim, close hashes
            ("c", "d", 0.95, 40),  # negative: high text sim, far hashes
        ],
        "doc_a string, doc_b string, text_sim double, min_hamming int",
    )
    res = grid_search_thresholds(
        labels, scored, hamming_radii=(8,), text_floors=(0.5,), text_onlys=(0.93, 0.99)
    )
    assert res[0]["text_only"] == 0.99 and res[0]["f1"] == 1.0
    assert res[-1]["f1"] < 1.0


def test_grid_search_asserts_scored_cfg_dominates(spark):
    """Sweeping outside the scored config's gating envelope must be rejected:
    gated rows carry bounds, not exact sims, for foreign thresholds."""
    import pytest

    from mediachain_indexer_spark.operators.scoring import ScoringConfig

    labels = spark.createDataFrame(
        [("a", "b", True)], "doc_a string, doc_b string, is_match boolean"
    )
    scored = spark.createDataFrame(
        [("a", "b", 0.97, 2)],
        "doc_a string, doc_b string, text_sim double, min_hamming int",
    )
    dominant = ScoringConfig(hamming_radius=10, text_floor=0.4, text_only_threshold=0.93)
    res = grid_search_thresholds(labels, scored, scored_cfg=dominant)
    assert res[0]["f1"] == 1.0

    narrow = ScoringConfig(hamming_radius=8, text_floor=0.5, text_only_threshold=0.96)
    with pytest.raises(AssertionError):
        grid_search_thresholds(labels, scored, scored_cfg=narrow)
