"""Incremental entity ingest: per-increment ER against a persistent store.

Parity: the reference IS an incremental indexer — new records are
normalized, hashed, candidate-matched against the existing index, and
upserted with their dupe-cluster assignment (``mediachain/indexer/
mc_ingest.py`` streaming ingest + ``mc_dedupe.py`` neighbor match).  The
batch pipeline (plans/pipeline.py) rebuilds the world; this module folds an
increment in WITHOUT re-scoring the existing corpus:

store layout (each table MERGE-upserted via sources/merge.py — Iceberg
tables in prod):
    <root>/features  (doc_id, norm_text, phashes)
    <root>/blocks    (block_key, doc_id, bk_doc)     bk_doc = composite key
    <root>/entities  (doc_id, entity_id)

per increment:
1. normalize the new docs → upsert features;
2. block the new docs (band keys depend only on the doc itself, so they
   equal the batch pipeline's keys) → upsert blocks;
3. candidate pairs: all stored docs sharing a block key TOUCHED by the
   increment (left-semi prune), capped/salted by the same pair machinery,
   then filtered to pairs with ≥1 increment endpoint — old↔old pairs were
   decided in their own increment and scores never change;
4. score those pairs against the stored features (vectorized cascade);
5. re-cluster ONLY the affected subgraph: new match edges ∪ the
   member→entity edges of every entity touched by a match or containing an
   increment doc.  entity_id = min(doc_id) of the component, so merging two
   old entities through a new bridge doc yields exactly the id a full batch
   run would — verified by the split-corpus ≡ one-shot equivalence test
   (tests/test_ingest_increment.py);
6. upsert the affected assignments into the entity table.

Deletions (``delete_docs``) are first-class: the affected entities are
re-resolved from stored features/blocks so bridge-doc removals SPLIT
entities and min-doc removals re-root them — equivalent to a from-scratch
batch run on the remaining corpus (tests/test_delete.py).

Scale: each step touches O(increment + blast radius), never the corpus —
the semi-joins prune at the block level, the CC runs on the bounded
subgraph, and the MERGE rewrites only affected buckets.  Caveat: block-size
caps sample by xxhash rank over whichever docs are PRESENT, so over-cap
blocks may sample differently than a from-scratch batch run (same cap
semantics, different sample) — under-cap corpora are bit-equivalent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediachain_indexer_spark.operators.blocking import build_blocks
from mediachain_indexer_spark.operators.cluster import (
    attach_components,
    connected_components,
)
from mediachain_indexer_spark.operators.normalize import normalize_documents
from mediachain_indexer_spark.operators.pairs import candidate_pairs
from mediachain_indexer_spark.operators.scoring import score_pairs
from mediachain_indexer_spark.plans.pipeline import PipelineConfig
from mediachain_indexer_spark.sources.merge import (
    _table_exists,
    delete_rows,
    read_entities,
    upsert_entities,
)


@dataclass(frozen=True)
class EntityStore:
    root: str
    n_buckets: int = 16

    @property
    def features(self) -> str:
        return os.path.join(self.root, "features")

    @property
    def blocks(self) -> str:
        return os.path.join(self.root, "blocks")

    @property
    def entities(self) -> str:
        return os.path.join(self.root, "entities")


_BLOCKS_SCHEMA = "block_key string, doc_id string, bk_doc string"
_FEATURES_SCHEMA = "doc_id string, norm_text string, phashes array<long>"


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-safe store read: a fully-deleted table has no bucket dirs left
    and parquet schema inference would fail on the bare directory."""
    if not _table_exists(path):
        return spark.createDataFrame([], schema)
    return read_entities(spark, path)


def read_store_entities(spark: SparkSession, store: EntityStore) -> DataFrame:
    """Current (doc_id, entity_id) table (empty frame if nothing ingested)."""
    return _read_or_empty(spark, store.entities, "doc_id string, entity_id string")


def ingest_increment(
    docs_inc: DataFrame,
    store: EntityStore,
    cfg: PipelineConfig = PipelineConfig(),
) -> dict:
    """Fold one increment of spans-shaped documents into the store."""
    spark = docs_inc.sparkSession

    feats_inc = (
        normalize_documents(docs_inc)
        .select("doc_id", "norm_text", "phashes")
        .persist()
    )
    n_inc = feats_inc.count()
    upsert_entities(feats_inc, store.features, "doc_id", store.n_buckets)

    # the store's persisted block layout stays 2-column (+ composite key):
    # exact_hash is a transient pair-generation hint (operators/pairs), and
    # store blocks read back without it simply take the dedup-everything path
    blocks_inc = build_blocks(feats_inc, cfg.blocking).select(
        "block_key", "doc_id"
    ).persist()
    blocks_keyed = blocks_inc.withColumn(
        "bk_doc", F.concat_ws("|", "block_key", "doc_id")
    )
    upsert_entities(blocks_keyed, store.blocks, "bk_doc", store.n_buckets)

    # candidates: stored docs sharing any block key the increment touched
    blocks_all = read_entities(spark, store.blocks).select("block_key", "doc_id")
    touched_keys = blocks_inc.select("block_key").distinct()
    cand_blocks = blocks_all.join(touched_keys, "block_key", "left_semi")
    pairs = candidate_pairs(cand_blocks, cfg.pairs)

    inc_ids = feats_inc.select("doc_id").persist()
    pa = pairs.join(
        inc_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi"
    )
    pb = pairs.join(
        inc_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi"
    )
    inc_pairs = pa.unionByName(pb).dropDuplicates(["doc_a", "doc_b"])

    feats_all = read_entities(spark, store.features)
    scored = score_pairs(inc_pairs, feats_all, cfg.scoring).persist()
    matches = scored.where(F.col("is_match")).select("doc_a", "doc_b")
    n_pairs = scored.count()

    # bounded re-cluster: increment docs + every member of a touched entity
    existing = read_store_entities(spark, store)
    match_docs = (
        matches.select(F.col("doc_a").alias("doc_id"))
        .unionByName(matches.select(F.col("doc_b").alias("doc_id")))
        .unionByName(inc_ids)
        .distinct()
    )
    touched_ents = existing.join(match_docs, "doc_id", "left_semi").select(
        "entity_id"
    ).distinct()
    members = existing.join(touched_ents, "entity_id", "left_semi")
    member_edges = members.where(F.col("doc_id") != F.col("entity_id")).select(
        F.col("doc_id").alias("doc_a"), F.col("entity_id").alias("doc_b")
    )
    edges = matches.unionByName(member_edges)
    comps = connected_components(edges)
    affected = match_docs.unionByName(members.select("doc_id")).distinct()
    assign = attach_components(affected, comps)
    sink_stats = upsert_entities(assign, store.entities, "doc_id", store.n_buckets)

    stats = {
        "n_docs_in": n_inc,
        "n_pairs_scored": n_pairs,
        "n_matches": matches.count(),
        "n_docs_reassigned": assign.count(),
        "sink": sink_stats,
    }
    for df in (feats_inc, blocks_inc, inc_ids, scored):
        df.unpersist()
    return stats


def delete_docs(
    del_ids: DataFrame,
    store: EntityStore,
    cfg: PipelineConfig = PipelineConfig(),
) -> dict:
    """Remove documents from the store and re-resolve the affected entities.

    Deletion is the HARD mutation for transitive clustering: removing a
    bridge document must SPLIT the entity it held together (A~B, B~C with
    A≁C collapses to {A}, {C} when B goes), and removing an entity's
    canonical-min doc must re-root the survivors.  Neither is derivable
    from the assignment table alone, so the affected subgraph is re-scored:

    1. affected entities = entities containing any deleted doc;
    2. remaining members = their members minus the deleted docs;
    3. candidate pairs among the remaining members only (their stored block
       keys, same cap/salt machinery), re-scored from stored features —
       deletion can't create edges to UNtouched entities (any such match
       would already have merged them), so the blast radius is exactly the
       touched entities;
    4. connected components over the surviving matches → new assignments
       (entity_id = min(doc_id) re-roots automatically);
    5. store mutations: rows deleted from features/blocks/entities
       (bucket-scoped MERGE DELETE), new assignments upserted.

    Equivalence contract (tests/test_delete.py): after any delete, the
    store's entity table equals the one-shot batch pipeline on the
    remaining corpus — exact ids, including splits.  Same over-cap caveat
    as ``ingest_increment``: block-size caps sample by xxhash rank over the
    docs PRESENT, so over-cap blocks may sample differently than a
    from-scratch run; under-cap corpora are bit-equivalent.
    """
    spark = del_ids.sparkSession
    del_ids = del_ids.select("doc_id").distinct().persist()

    existing = read_store_entities(spark, store)
    touched_ents = existing.join(del_ids, "doc_id", "left_semi").select(
        "entity_id"
    ).distinct()
    members = existing.join(touched_ents, "entity_id", "left_semi")
    remaining = (
        members.join(del_ids, "doc_id", "left_anti").select("doc_id").persist()
    )

    blocks_all = _read_or_empty(spark, store.blocks, _BLOCKS_SCHEMA).select(
        "block_key", "doc_id"
    )
    rem_blocks = blocks_all.join(remaining, "doc_id", "left_semi")
    pairs = candidate_pairs(rem_blocks, cfg.pairs)
    feats_all = _read_or_empty(spark, store.features, _FEATURES_SCHEMA)
    scored = score_pairs(pairs, feats_all, cfg.scoring).persist()
    matches = scored.where(F.col("is_match")).select("doc_a", "doc_b")
    n_pairs = scored.count()

    comps = connected_components(matches)
    # PIN the new assignments BEFORE any store mutation: assign reads the
    # entities/blocks/features parquet through remaining/comps, and the
    # delete_rows calls below REWRITE those very tables — an unmaterialized
    # assign would re-read post-delete state (the deleted doc no longer
    # marks its entity as touched) and silently drop every reassignment
    n_requested = del_ids.count()
    assign = attach_components(remaining, comps).localCheckpoint()
    n_reassigned = assign.count()

    d_feats = delete_rows(spark, store.features, "doc_id", del_ids, store.n_buckets)
    delete_rows(spark, store.blocks, "doc_id", del_ids, store.n_buckets)
    d_ents = delete_rows(spark, store.entities, "doc_id", del_ids, store.n_buckets)
    sink_stats = (
        upsert_entities(assign, store.entities, "doc_id", store.n_buckets)
        if n_reassigned
        else {"n_upserted": 0, "n_buckets_touched": 0}
    )

    stats = {
        "n_requested": n_requested,
        "n_deleted": d_ents["n_deleted"],
        "n_docs_in_store_deleted": d_feats["n_deleted"],
        "n_pairs_rescored": n_pairs,
        "n_docs_reassigned": n_reassigned,
        "sink": sink_stats,
    }
    for df in (del_ids, remaining, scored):
        df.unpersist()
    return stats
