"""Store deletions (plans/ingest.delete_docs): entity SPLITS, re-rooting,
idempotence, and exact equivalence with a one-shot batch run on the
remaining corpus.

Deletion is the hard mutation for transitive clustering — removing a bridge
doc must split its entity, and removing an entity's canonical-min doc must
re-root the survivors.  The chain fixture is engineered on the scoring
math (round-4 defaults): A~B and B~C pass the text-only threshold
(1-edit lev_sim = 119/120 ≈ 0.992 ≥ 0.99) while A≁C misses it (2 edits,
118/120 ≈ 0.983 < 0.99), so {A, B, C} is one entity exactly while B exists.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mediachain_indexer_spark.plans.ingest import (
    EntityStore,
    delete_docs,
    ingest_increment,
    read_store_entities,
)
from mediachain_indexer_spark.plans.pipeline import run_pipeline
from mediachain_indexer_spark.sources.io import SPANS_SCHEMA

_BASE = "qwertyuiopasdfghjklzxcvbnmqwer" * 4  # 120 chars; edits at the head
# kill the Winkler prefix boost, keeping the A-C pair under the 0.99
# threshold while 1-edit neighbors clear it (119/120)


def _chain_docs(spark):
    texts = {
        "x_chain_a": _BASE,
        "x_chain_b": "z" + _BASE[1:],
        "x_chain_c": "zx" + _BASE[2:],
    }
    rows = [(d, [("text", t, None, 0)]) for d, t in sorted(texts.items())]
    return spark.createDataFrame(rows, SPANS_SCHEMA)


def _entities(spark, store):
    return {
        r["doc_id"]: r["entity_id"] for r in read_store_entities(spark, store).collect()
    }


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id string")


def test_delete_bridge_splits_entity(spark, tmp_path):
    docs = _chain_docs(spark)
    store = EntityStore(str(tmp_path / "store"))
    ingest_increment(docs, store)
    pre = _entities(spark, store)
    assert pre == {
        "x_chain_a": "x_chain_a",
        "x_chain_b": "x_chain_a",
        "x_chain_c": "x_chain_a",
    }  # one entity, rooted at the min doc — B bridges A and C

    stats = delete_docs(_ids(spark, ["x_chain_b"]), store)
    assert stats["n_deleted"] == 1
    post = _entities(spark, store)
    assert post == {"x_chain_a": "x_chain_a", "x_chain_c": "x_chain_c"}  # SPLIT

    # equivalence with the one-shot batch on the remaining corpus
    batch = {
        r["doc_id"]: r["entity_id"]
        for r in run_pipeline(
            docs.where(F.col("doc_id") != "x_chain_b")
        ).clusters.collect()
    }
    assert post == batch


def test_delete_min_doc_reroots_entity(spark, tmp_path):
    docs = _chain_docs(spark)
    store = EntityStore(str(tmp_path / "store"))
    ingest_increment(docs, store)

    delete_docs(_ids(spark, ["x_chain_a"]), store)
    post = _entities(spark, store)
    # B~C still match; the entity re-roots at the new min (B)
    assert post == {"x_chain_b": "x_chain_b", "x_chain_c": "x_chain_b"}


def test_delete_equals_batch_on_remaining(spark, docs500, golden500, tmp_path):
    """The flagship oracle: store after delete == one-shot batch pipeline on
    the remaining corpus — exact entity ids, across a mixed delete set
    (a bridge doc, a multi-member cluster's canonical-min doc, a regular
    member, and a nonexistent id)."""
    docs = docs500.unionByName(_chain_docs(spark))
    store = EntityStore(str(tmp_path / "store"))
    ingest_increment(docs.where(F.xxhash64("doc_id") % 2 == 0), store)
    ingest_increment(docs.where(F.xxhash64("doc_id") % 2 != 0), store)

    groups: dict[str, list[str]] = {}
    for r in golden500.collect():
        groups.setdefault(r["entity_id"], []).append(r["doc_id"])
    multi = sorted(g for g in groups.values() if len(g) >= 3)
    min_doc = sorted(multi[0])[0]  # canonical-min of a 3+ cluster
    member = sorted(multi[1])[1]  # non-min member of another cluster
    del_set = ["x_chain_b", min_doc, member, "zzz_not_in_store"]

    stats = delete_docs(_ids(spark, del_set), store)
    assert stats["n_deleted"] == 3  # the nonexistent id is a no-op

    post = _entities(spark, store)
    batch = {
        r["doc_id"]: r["entity_id"]
        for r in run_pipeline(
            docs.join(_ids(spark, del_set), "doc_id", "left_anti")
        ).clusters.collect()
    }
    assert post == batch


def test_delete_idempotent_and_whole_entity(spark, tmp_path):
    docs = _chain_docs(spark)
    store = EntityStore(str(tmp_path / "store"))
    ingest_increment(docs, store)

    all_ids = ["x_chain_a", "x_chain_b", "x_chain_c"]
    stats1 = delete_docs(_ids(spark, all_ids), store)
    assert stats1["n_deleted"] == 3
    assert _entities(spark, store) == {}  # whole entity gone

    stats2 = delete_docs(_ids(spark, all_ids), store)  # idempotent replay
    assert stats2["n_deleted"] == 0
    assert _entities(spark, store) == {}
