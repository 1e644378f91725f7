"""Free-text relevance search: BM25 ranking over a document corpus.

Parity: the reference exposes ``/search`` — a relevance-ranked text query
over the indexed media documents, delegated to Elasticsearch's Lucene BM25
scorer ([PK] mediachain/indexer/mc_web.py search handler +
mc_models.py query construction).  The Spark-first rebuild makes the index
a DataFrame: a postings table (term, doc_id, tf) built with ONE exploding
aggregation, scored with the standard BM25 formula (Robertson et al.;
the idf shape below is Lucene's ``ln(1 + (N - df + 0.5)/(df + 0.5))``,
which is what the reference's ES backend computes).

Scale shape (10^12 docs):

- **Index build** is one ``explode → groupBy(doc_id, term)`` shuffle with
  map-side combine (tf counting collapses duplicate tokens before the
  exchange).  In production the postings table is written bucketed by
  ``term`` so the query path prunes to matched buckets.
- **Query path never rescans the corpus**: the query's term set (a handful
  of rows) broadcasts; ``postings ⋈ broadcast(query_terms)`` prunes the
  postings to matched terms BEFORE any sizing stats or scoring — df, idf
  and the score join all run on that pruned slice.  The per-doc length
  table joins the pruned slice on doc_id (AQE broadcasts the small pruned
  side at runtime); corpus-level N/avgdl is a one-row aggregate attached
  via a broadcast cross join.
- **Top-k per query** is one rank window partitioned by query_id — k rows
  per query survive.

Determinism: scores are float64 sums whose partial-aggregation order Spark
does not fix, and ``ln`` differs from DuckDB's by 1 ulp on ~2% of inputs
(measured), so the public output is the RANKING, not the raw score: ranks
order by ``round(score, 6)`` with doc_id tiebreak, making sub-microscore
noise unable to flip an ordering except exactly at a rounding boundary
(probability ~1e-10 per pair; the fixture corpus is deterministic and
verified).  Callers needing scores use ``bm25_scores`` and tolerate ulps.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"
DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def tokenize_query(q: str) -> list[str]:
    """Query-string tokenizer — the same lower/split/drop-empties chain the
    postings build applies to documents (order-preserving unique terms)."""
    return list(dict.fromkeys(t for t in re.split(TOKEN_SPLIT, q.lower()) if t))


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf): term frequencies per document.

    One shuffle: the explode stays in the scan stage and the groupBy's
    partial aggregation collapses repeated tokens map-side, so the exchange
    carries distinct (doc, term) pairs, not raw token occurrences."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
    ).where(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def doc_lengths(postings: DataFrame) -> DataFrame:
    """(doc_id, dl): token count per document, from the postings table
    (exact: sum of tf) — no second pass over the raw text."""
    return postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def bm25_scores(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, n_matched, score): BM25 score of every document
    matching ≥1 term of each query.

    ``queries`` = [(query_id, query_text)].  All corpus statistics (df, N,
    avgdl) are computed from the postings table; exact-integer counts feed
    float math only at the final idf/tf-normalization expressions.

    ``postings``: a prebuilt/materialized ``build_postings`` table.  The
    scoring DAG branches off the postings four ways (matched slice, df,
    doc lengths, corpus stats), so the inline path re-scans the corpus per
    branch — harmless at test scale, wrong at 10^12 docs.  The production
    shape is index-build-once: write ``build_postings(docs)`` to a table
    bucketed by term, pass it (or a persisted frame) here, and every
    branch reads the materialized index instead."""
    spark = docs.sparkSession
    if postings is None:
        postings = build_postings(docs, id_col, text_col)
    dl = doc_lengths(postings)
    # one-row corpus stats; sum/count stay exact integers, the division is
    # the only float op (bit-stable: IEEE division of exact operands)
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).withColumn(
        "avgdl", F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    )

    qrows = [
        (qid, term) for qid, qtext in queries for term in tokenize_query(qtext)
    ]
    if not qrows:
        raise ValueError("bm25: no query terms after tokenization")
    qterms = spark.createDataFrame(qrows, ["query_id", "term"])

    # prune FIRST: everything downstream sees only matched-term postings
    matched = postings.join(F.broadcast(qterms.select("term").distinct()), "term")
    dft = matched.groupBy("term").agg(F.count("*").alias("df"))  # (doc,term) unique

    contrib = (
        matched.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0)
                        - F.lit(b)
                        + F.lit(b)
                            * F.col("dl").cast("double")
                            / F.col("avgdl")
                    )
                )
            ).alias("contrib"),
        )
    )
    return contrib.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_matched"), F.sum("contrib").alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """(query_id, doc_id, rank): top-k BM25 results per query.

    Rank orders by ``round(score, 6)`` descending with doc_id ascending as
    the tiebreak — the quantized key makes the ordering robust to the
    sub-microscore float noise documented in the module docstring."""
    scores = bm25_scores(docs, queries, k1, b, id_col, text_col, postings)
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank")
    )
