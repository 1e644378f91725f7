"""Similarity search over embedding columns (array<float>).

Parity anchor: the reference wraps an approximate-NN index over hash/feature
vectors behind a storage interface (``mediachain/indexer/mc_neighbors.py``).
Spark-first replacement: no serving-time index — brute-force cosine as the
exact baseline, and random-hyperplane LSH bucketing as the scale path
(candidates collide in a bucket, exact cosine refines within the bucket).

Vector math is numpy-vectorized Arrow ``pandas_udf`` (functions/vecmath.py).
Round 1 shipped these kernels as zip_with/aggregate higher-order functions
("pure JVM"); HOF lambdas are interpreted per array element, and the round-2
micro-bench (vecmath.py docstring) shows the fastest shape at every dim is
the closure kernel — query matrix in the UDF closure, corpus crossing Arrow
once.  At 10^9 × 768-dim the dot product IS the workload, so brute-force
top-k uses the closure kernel; the LSH refine (genuinely per-pair inputs)
uses the per-pair numpy kernel.
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
    """Exact top-k neighbors of each query vector.

    Scale shape: the query set is the SMALL side — it is collected to the
    driver (the explicit form of a broadcast; same size bound applies) and
    baked into the cosine kernel's closure as an (nq, dim) matrix.  The
    corpus is scanned once, crosses Arrow once (vector column only — the
    naive crossJoin(broadcast(q)) re-ships the constant query vector with
    every corpus row), and each Arrow batch computes all nq cosines as one
    (batch, dim) @ (dim, nq) product.  Per-query top-k via a window; only
    (corpus × nq) id/score rows ever shuffle, never vectors.
    """
    import numpy as np

    from mediachain_indexer_spark.functions.vecmath import (
        make_multi_query_cosine_udf,
    )

    qrows = query.select(id_col, vec_col).collect()
    if not qrows:
        schema = "query_id long, neighbor_id long, cosine double, rnk int"
        return vectors.sparkSession.createDataFrame([], schema)
    qids = [r[0] for r in qrows]
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    cos_all = make_multi_query_cosine_udf(Q)
    qid_lit = F.array(*[F.lit(q) for q in qids])

    scored = (
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.posexplode(cos_all(F.col(vec_col))).alias("qpos", "cosine_raw"),
        )
        .select(
            F.element_at(qid_lit, F.col("qpos") + 1).alias("query_id"),
            "neighbor_id",
            F.round("cosine_raw", round_digits).alias("cosine"),
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
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
