"""Vectorized embedding math — numpy Arrow ``pandas_udf`` kernels.

Round-1 measured (and memory-recorded) fact: Spark's higher-order array
lambdas (``zip_with``/``aggregate``) are *interpreted per element*, not
codegen'd — the 64-slot MinHash migration off HOFs was ~30× (300s → 11s at
100k docs).  The cosine/dot kernels here are the same migration for the
similarity operators: one Arrow crossing, all math as (batch, dim) float64
numpy ops.

Numeric parity with the DuckDB oracles: inputs are upcast to float64 BEFORE
the multiply (DuckDB's ``LIST_TRANSFORM(e, x -> CAST(x AS DOUBLE))`` does the
same; the old HOF multiplied in float32 then cast) and the reduction is
``einsum`` (sequential C-loop accumulation, matching list_dot_product's
fold order more closely than BLAS-reordered ``matmul``).  Consumers round
to ≤ 6 digits, absorbing any last-ulp difference.

Micro-bench (this sandbox, local[32], 200k × 64-dim corpus, brute-force
cosine vs one query): HOF zip_with/aggregate 21.3s → pandas_udf 2.9s (7.3×);
see BENCH/BASELINE.md.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType


def _stack(s: pd.Series) -> np.ndarray:
    """Series of array<float|double> cells → (batch, dim) float64 matrix."""
    vals = s.to_numpy()
    if len(vals) == 0:
        return np.zeros((0, 1), dtype=np.float64)
    return np.stack([np.asarray(v, dtype=np.float64) for v in vals])


def _dot_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.einsum("ij,ij->i", a, b)


def cosine_batch_np(a: pd.Series, b: pd.Series) -> pd.Series:
    A, B = _stack(a), _stack(b)
    num = _dot_np(A, B)
    den = np.sqrt(_dot_np(A, A)) * np.sqrt(_dot_np(B, B))
    with np.errstate(divide="ignore", invalid="ignore"):
        out = num / den
    return pd.Series(np.where(den == 0.0, 0.0, out))


def dot_batch_np(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(_dot_np(_stack(a), _stack(b)))


def norm_batch_np(a: pd.Series) -> pd.Series:
    A = _stack(a)
    return pd.Series(np.sqrt(_dot_np(A, A)))


cosine_batch = pandas_udf(cosine_batch_np, returnType=DoubleType())
dot_batch = pandas_udf(dot_batch_np, returnType=DoubleType())
norm_batch = pandas_udf(norm_batch_np, returnType=DoubleType())


def make_hyperplane_bucket_udf(planes: list[list[float]]):
    """One Arrow crossing computing ALL hyperplane sign bits → bucket string.

    Replaces n_planes separate HOF dot products (each interpreted per
    element) with a single (batch, dim) @ (dim, n_planes) float64 matmul;
    the '0'/'1' bucket string is built batch-wide via the UCS-4 codepoint
    view (no per-row Python), same trick as functions/simtext._encode.
    """
    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    n_planes = P.shape[1]

    def bucket(v: pd.Series) -> pd.Series:
        X = _stack(v)
        signs = X @ P >= 0.0  # (batch, n_planes)
        codes = np.where(signs, ord("1"), ord("0")).astype(np.uint32)
        s = np.ascontiguousarray(codes).view(f"U{n_planes}").ravel()
        return pd.Series(s)

    return pandas_udf(bucket, returnType=StringType())
