"""BM25 text search (reference R11): rank parity against an independent
pure-Python/numpy BM25 implementation, scale-shape plan assertions, and
relevance sanity on an engineered corpus."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from mediachain_indexer_spark.operators.search import (
    DEFAULT_B,
    DEFAULT_K1,
    bm25_scores,
    bm25_topk,
    tokenize_query,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_bm25(docs: list[tuple[int, str]], queries, k1=DEFAULT_K1, b=DEFAULT_B):
    """Independent reference: dict-based postings, Lucene idf shape."""
    postings: dict[str, dict[int, int]] = {}
    dl: dict[int, int] = {}
    for doc_id, text in docs:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        if not toks:
            continue
        dl[doc_id] = len(toks)
        for t in toks:
            postings.setdefault(t, {}).setdefault(doc_id, 0)
            postings[t][doc_id] += 1
    n = len(dl)
    avgdl = sum(dl.values()) / n
    out: dict[str, dict[int, float]] = {}
    for qid, qtext in queries:
        scores: dict[int, float] = {}
        for term in tokenize_query(qtext):
            hits = postings.get(term, {})
            if not hits:
                continue
            idf = math.log(1.0 + (n - len(hits) + 0.5) / (len(hits) + 0.5))
            for doc_id, tf in hits.items():
                contrib = (
                    idf
                    * (tf * (k1 + 1.0))
                    / (tf + k1 * (1.0 - b + b * dl[doc_id] / avgdl))
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        out[qid] = scores
    return out


QUERIES = [("q1", "spark window agg"), ("q2", "hash join merge")]


@pytest.fixture(scope="module")
def docs_pdf(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    return [(int(r.doc_id), r.text) for r in df.collect()]


def test_bm25_scores_match_python_reference(spark, docs_pdf):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r.query_id, int(r.doc_id)): float(r.score)
        for r in bm25_scores(docs, QUERIES).collect()
    }
    ref = _py_bm25(docs_pdf, QUERIES)
    ref_flat = {
        (qid, doc_id): s for qid, scores in ref.items() for doc_id, s in scores.items()
    }
    assert set(got) == set(ref_flat)
    for key, s in got.items():
        assert s == pytest.approx(ref_flat[key], rel=1e-12), key


def test_bm25_topk_rank_matches_python_reference(spark, docs_pdf):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = bm25_topk(docs, QUERIES, k=10).collect()
    ref = _py_bm25(docs_pdf, QUERIES)
    for qid in ("q1", "q2"):
        want = sorted(
            ref[qid].items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )[:10]
        got_q = sorted(
            ((int(r.doc_id), r.rank) for r in got if r.query_id == qid),
            key=lambda dr: dr[1],
        )
        assert [d for d, _ in got_q] == [d for d, _ in want]


def test_bm25_plan_broadcasts_query_side(spark):
    """Scale shape: the query-term joins broadcast (never shuffle the
    postings on the tiny side) and nothing degenerates to a cartesian
    product except the one-row stats attach."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = bm25_topk(docs, QUERIES, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_relevance_on_engineered_corpus(spark):
    """A doc repeating the exact query phrase outranks everything; a doc
    with zero query terms never appears."""
    rows = [
        (1, "spark window agg spark window agg spark window agg"),
        (2, "spark table scan with one window mention and agg"),
        (3, "completely unrelated vocabulary about fruit and cheese"),
        (4, "window"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = bm25_topk(docs, [("q", "spark window agg")], k=4).collect()
    by_rank = sorted(got, key=lambda r: r.rank)
    assert int(by_rank[0].doc_id) == 1
    assert all(int(r.doc_id) != 3 for r in got)


def test_bm25_prebuilt_postings_identical(spark):
    """The production index-build-once path (materialized postings injected)
    returns exactly the inline path's ranking."""
    from mediachain_indexer_spark.operators.search import build_postings

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    inline = {
        (r.query_id, int(r.doc_id), r.rank)
        for r in bm25_topk(docs, QUERIES, k=10).collect()
    }
    idx = build_postings(docs).persist()
    try:
        injected = {
            (r.query_id, int(r.doc_id), r.rank)
            for r in bm25_topk(docs, QUERIES, k=10, postings=idx).collect()
        }
    finally:
        idx.unpersist()
    assert injected == inline


def test_bm25_empty_query_raises(spark):
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="no query terms"):
        bm25_scores(docs, [("q", "  !!  ")])
