"""Similarity search over embedding columns (array<float>).

Parity anchor: the reference wraps an approximate-NN index over hash/feature
vectors behind a storage interface (``mediachain/indexer/mc_neighbors.py``).
Spark-first replacement: no serving-time index — brute-force cosine as the
exact baseline, and random-hyperplane LSH bucketing as the scale path
(candidates collide in a bucket, exact cosine refines within the bucket).

Vector math is numpy-vectorized Arrow ``pandas_udf`` (functions/vecmath.py):
round 1 shipped these kernels as zip_with/aggregate higher-order functions
("pure JVM"), but HOF lambdas are interpreted per array element — the
measured gap is ~7× at 64-dim (and grows with dim; the MinHash HOF→numpy
migration was 30×).  At 10^9 × 768-dim the dot product IS the workload, so
the kernel must be the vectorized one.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediachain_indexer_spark.functions.vecmath import (
    cosine_batch,
    make_hyperplane_bucket_udf,
)


def cosine_topk_bruteforce(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors of each query vector (broadcast the queries).

    Scale: queries broadcast, corpus scanned once, per-query top-k via a
    window — O(corpus × queries) work with ONE Arrow crossing for the
    cosine batch, no shuffle of the corpus (the only shuffle is the
    per-query top-k, k rows per query per partition after the window's
    rank filter).
    """
    q = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    joined = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
    ).crossJoin(F.broadcast(q))
    cos = cosine_batch(F.col("v"), F.col("qv"))
    scored = joined.where(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", F.round(cos, round_digits).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_signatures(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign) LSH signature per vector → bucket string.

    P(bit match) = 1 - θ/π: close vectors share buckets.  All n_planes sign
    bits come from one (batch, dim) @ (dim, n_planes) matmul in a single
    Arrow crossing (round 1 evaluated n_planes interpreted HOF dots).
    """
    bucket_udf = make_hyperplane_bucket_udf(_planes(dim, n_planes, seed))
    return vectors.select(
        F.col(id_col),
        F.col(vec_col),
        bucket_udf(F.col(vec_col)).alias("bucket"),
    )


def cosine_neighbors_lsh(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 12,
    min_cosine: float = 0.5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-neighbor pairs: LSH bucket join + exact cosine refine.

    The scale path: candidates only form within a bucket (the shuffle is
    partitioned by bucket), the exact cosine runs on the candidates — the
    same block→refine shape as the ER pipeline.
    """
    sigs = hyperplane_signatures(vectors, dim, n_planes, seed, id_col, vec_col)
    a = sigs.select(
        "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = sigs.select(
        "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    cos = cosine_batch(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= min_cosine)
        .dropDuplicates(["id_a", "id_b"])
    )
