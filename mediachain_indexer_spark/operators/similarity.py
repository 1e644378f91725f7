"""Similarity search over embedding columns (array<float>).

Parity anchor: the reference wraps an approximate-NN index over hash/feature
vectors behind a storage interface (``mediachain/indexer/mc_neighbors.py``).
Spark-first replacement: no serving-time index — brute-force cosine as the
exact baseline, and random-hyperplane LSH bucketing as the scale path
(candidates collide in a bucket, exact cosine refines within the bucket).

All vector math is JVM higher-order functions (zip_with/aggregate) — no
UDFs, stays in the executor.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


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
    window — O(corpus × queries) JVM work, no shuffle of the corpus.
    """
    q = query.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    joined = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
    ).crossJoin(F.broadcast(q))
    cos = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
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


def hyperplane_signatures(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign) LSH signature per vector → bucket string.

    P(bit match) = 1 - θ/π: close vectors share buckets.  Hyperplanes are
    seeded literal arrays — constant-folded, evaluated JVM-side.
    """
    rng = random.Random(seed)
    sig_bits = []
    for _ in range(n_planes):
        plane = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        plane_lit = F.array(*[F.lit(x) for x in plane])
        sig_bits.append(
            F.when(_dot(F.col(vec_col), plane_lit) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
        )
    return vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.concat(*sig_bits).alias("bucket"),
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
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= min_cosine)
        .dropDuplicates(["id_a", "id_b"])
    )
