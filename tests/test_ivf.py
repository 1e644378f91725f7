"""IVF (inverted-file) ANN: exhaustive probe ≡ brute force; partial probe
finds planted near-dups; cells partition the corpus."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mediachain_indexer_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
    train_ivf_centroids,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(60, 16).astype("float32")
    base[5] = base[0] + 0.01 * rng.randn(16).astype("float32")  # near-dup of 0
    rows = [(i, base[i].tolist()) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exhaustive_probe_equals_bruteforce(spark, vec_df):
    """n_probe == n_centroids searches every cell: result must be
    row-identical to the brute-force baseline (the IVF correctness oracle)."""
    q = vec_df.where(F.col("vec_id") < 3)
    bf = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in cosine_topk_bruteforce(vec_df, q, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in ivf_topk(vec_df, q, k=5, n_centroids=4, n_probe=4).collect()
    }
    assert ivf == bf


def test_partial_probe_finds_planted_neighbor(spark, vec_df):
    """The planted near-dup (cosine ≈ 1) shares its query's cell, so even
    1-probe search must surface it as the top neighbor."""
    q = vec_df.where(F.col("vec_id") == 0)
    out = ivf_topk(vec_df, q, k=3, n_centroids=4, n_probe=1).collect()
    assert out, "probe returned nothing"
    top = min(out, key=lambda r: r["rnk"])
    assert top["neighbor_id"] == 5


def test_centroids_shape_and_cells_cover(spark, vec_df):
    C = train_ivf_centroids(vec_df, n_centroids=4, sample_size=100)
    assert C.shape == (4, 16)
    # every centroid is unit-norm (spherical k-means)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-9)


def test_query_side_size_boundary(spark, vec_df):
    """The driver-side query collect is bounded (round-4 verdict #5): a
    query frame larger than max_queries raises a clear error pointing at
    the corpus-level LSH path, for both brute force and IVF; the transfer
    itself is limit-bounded so the driver never materializes the excess."""
    with pytest.raises(ValueError, match="cosine_neighbors_lsh"):
        cosine_topk_bruteforce(vec_df, vec_df, k=2, max_queries=10)
    with pytest.raises(ValueError, match="max_queries=10"):
        ivf_topk(vec_df, vec_df, k=2, n_centroids=4, max_queries=10)
    # at exactly the bound it runs
    q = vec_df.where(F.col("vec_id") < 3)
    assert cosine_topk_bruteforce(vec_df, q, k=2, max_queries=3).count() > 0
