"""Fixture-generator determinism + shape (FIXTURES.md §B)."""

from __future__ import annotations

from mediachain_indexer_spark.sources import fixtures


def test_deterministic_across_calls():
    a = fixtures.generate_corpus(200)
    b = fixtures.generate_corpus(200)
    assert a.docs == b.docs
    assert a.labeled_pairs == b.labeled_pairs
    assert a.expected_clusters == b.expected_clusters


def test_doc_count_and_shape(corpus500):
    assert len(corpus500.docs) == 500
    for doc_id, spans in corpus500.docs:
        assert doc_id.startswith("d")
        kinds = {k for k, _, _, _ in spans}
        assert kinds <= {"text", "media"}
        assert "media" in kinds and "text" in kinds
        offsets = sorted(o for _, _, _, o in spans)
        assert offsets == list(range(len(spans)))
        for k, t, m, _ in spans:
            if k == "text":
                assert t is not None and m is None
            else:
                assert m is not None and t is None and m.startswith("m:")


def test_labels_cover_clusters(corpus500):
    clusters: dict[str, list[str]] = {}
    for doc_id, ent in corpus500.expected_clusters:
        clusters.setdefault(ent, []).append(doc_id)
    n_pos = sum(len(v) * (len(v) - 1) // 2 for v in clusters.values())
    got_pos = sum(1 for _, _, m in corpus500.labeled_pairs if m)
    assert got_pos == n_pos
    assert any(not m for _, _, m in corpus500.labeled_pairs)  # negatives exist
    # pairs are canonical and unique
    keys = [(a, b) for a, b, _ in corpus500.labeled_pairs]
    assert all(a < b for a, b in keys)
    assert len(keys) == len(set(keys))


def test_skewed_cluster_sizes(corpus500):
    sizes = {}
    for _, ent in corpus500.expected_clusters:
        sizes[ent] = sizes.get(ent, 0) + 1
    assert max(sizes.values()) >= 8  # heavy tail exists
    assert sum(1 for s in sizes.values() if s == 1) >= 20  # many singletons
