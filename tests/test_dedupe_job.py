"""spark-submit job entrypoint (jobs/dedupe_job.py): end-to-end run with
checkpointing, MERGE sink, eval, and resume-on-rerun."""

from __future__ import annotations

import argparse


def _args(**kw):
    base = dict(
        input=None,
        entity_sink=None,
        run_dir=None,
        run_id=None,
        labels=None,
        scoring_strategy="join",
        exact_strategy="clique",
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_job_end_to_end_with_resume(spark, corpus500_paths, tmp_path):
    from mediachain_indexer_spark.jobs.dedupe_job import run
    from mediachain_indexer_spark.sources.merge import read_entities

    sink = str(tmp_path / "entities")
    args = _args(
        input=corpus500_paths["spans_documents"],
        entity_sink=sink,
        run_dir=str(tmp_path / "runs"),
        run_id="test-run",
        labels=corpus500_paths["labeled_pairs"],
    )
    m1 = run(spark, args)
    assert m1["n_docs"] == 500
    assert m1["sink_stats"]["n_upserted"] == 500
    assert m1["eval"]["f1"] >= 0.99  # the north-rule acceptance gate
    stages = {s["stage"] for s in m1["stages"]}
    assert {"normalize", "block", "pairs", "score", "cluster"} <= stages
    assert read_entities(spark, sink).count() == 500

    # rerun with the same run_id: every stage resumes from checkpoint —
    # stage walls are not re-paid and the entity table stays identical
    m2 = run(spark, args)
    assert m2["n_docs"] == 500
    assert m2["wall_sec"] < m1["wall_sec"]
    t1 = {r["doc_id"]: r["entity_id"] for r in read_entities(spark, sink).collect()}
    assert len(t1) == 500


def test_job_grouped_strategy_with_checkpointing(spark, corpus500_paths, tmp_path):
    """--scoring-strategy grouped + --run-dir/--run-id used to crash after
    the pipeline finished: the grouped branch bypassed StageRunner, so
    stage_metrics() read a nonexistent lineage path (PATH_NOT_FOUND) and the
    metrics report was lost.  The grouped branch now checkpoints
    normalize/block/score/cluster (no separate pairs stage — pair generation
    happens inside the per-block scorer)."""
    from mediachain_indexer_spark.jobs.dedupe_job import run

    args = _args(
        input=corpus500_paths["spans_documents"],
        run_dir=str(tmp_path / "runs"),
        run_id="grouped-run",
        scoring_strategy="grouped",
    )
    m = run(spark, args)
    assert m["n_docs"] == 500
    stages = {s["stage"] for s in m["stages"]}
    assert {"normalize", "block", "score", "cluster"} <= stages

    # resume works for the grouped path too
    m2 = run(spark, args)
    assert m2["n_docs"] == 500
    assert m2["wall_sec"] < m["wall_sec"]
