"""Incremental ingest (plans/ingest.py): folding the corpus in two
increments must converge to EXACTLY the one-shot batch clustering —
including entity merges bridged by a later increment."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediachain_indexer_spark.plans.ingest import (
    EntityStore,
    ingest_increment,
    read_store_entities,
)
from mediachain_indexer_spark.plans.pipeline import run_pipeline


def _clusters(df) -> dict:
    return {r["doc_id"]: r["entity_id"] for r in df.collect()}


def test_two_increments_equal_one_shot(spark, docs500, tmp_path):
    store = EntityStore(str(tmp_path / "store"))

    # interleave by hash so duplicate clusters straddle the two increments
    # (forcing cross-increment matches AND old-entity merges)
    half_a = docs500.where(F.xxhash64("doc_id") % 2 == 0)
    half_b = docs500.where(F.xxhash64("doc_id") % 2 != 0)
    s1 = ingest_increment(half_a, store)
    assert s1["n_docs_in"] + half_b.count() == 500
    mid = _clusters(read_store_entities(spark, store))
    assert len(mid) == s1["n_docs_in"]

    s2 = ingest_increment(half_b, store)
    final = _clusters(read_store_entities(spark, store))
    assert len(final) == 500

    batch = _clusters(run_pipeline(docs500).clusters)
    assert final == batch  # exact: same entity ids, not just same partition

    # at least one cross-increment merge actually happened (the test would
    # be vacuous if the halves never shared an entity)
    merged = [d for d in mid if final[d] != mid[d]]
    assert s2["n_matches"] > 0
    assert len(merged) > 0


def test_increment_idempotent_replay(spark, docs500, tmp_path):
    """Replaying the same increment (at-least-once delivery) must not
    change assignments — the MERGE keys on doc_id."""
    store = EntityStore(str(tmp_path / "store"))
    ingest_increment(docs500, store)
    first = _clusters(read_store_entities(spark, store))
    ingest_increment(docs500, store)
    again = _clusters(read_store_entities(spark, store))
    assert again == first


def test_entity_ingest_stream_two_files(spark, corpus500_paths, tmp_path):
    """Streaming wrapper: two files arriving as separate micro-batches end
    with every doc assigned in the store's entity table."""
    import os
    import time

    from mediachain_indexer_spark.sources.io import SPANS_SCHEMA, read_documents
    from mediachain_indexer_spark.streaming.incremental import entity_ingest_stream

    docs = read_documents(spark, corpus500_paths["spans_documents"]).limit(60)
    src = tmp_path / "src"
    os.makedirs(src)
    half_a = docs.where(F.xxhash64("doc_id") % 2 == 0)
    half_b = docs.where(F.xxhash64("doc_id") % 2 != 0)
    n_total = docs.count()
    half_a.coalesce(1).write.parquet(str(src / "f1"))

    stream = spark.readStream.schema(SPANS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "*"))
    store_root = str(tmp_path / "store")
    q = entity_ingest_stream(
        stream, store_root, str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    try:
        q.awaitTermination(120)
        half_b.coalesce(1).write.parquet(str(src / "f2"))
        q2 = entity_ingest_stream(
            stream, store_root, str(tmp_path / "ckpt")
        ).trigger(availableNow=True).start()
        q2.awaitTermination(120)
    finally:
        for qq in spark.streams.active:
            qq.stop()

    final = _clusters(read_store_entities(spark, EntityStore(store_root)))
    assert len(final) == n_total
