"""Round-6 optimization harness (guide §1): plan capture + noop-sink
isolation for every bench operator.  bench.py is FROZEN for measurement;
everything exploratory lives here.

Subcommands:
    plans [--tag before|after]   write .explain("formatted") for every
                                 headline query + ER stage to plans/r06/
    pairs                        decompose the pairs stage: raw pair volume
                                 per branch, dedup cost, noop-sink walls
    stages                       noop-sink wall per ER stage (steady state)
    queries                      per-headline-query noop timing + job breakdown
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

PLANS_DIR = os.path.join(REPO, "plans", "r06")


def _spark():
    from mediachain_indexer_spark.session import get_spark

    spark = get_spark(app_name="mediachain-indexer-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    spark.conf.set("spark.sql.files.openCostInBytes", "512k")
    return spark


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def _write_plan(name: str, df, tag: str) -> None:
    os.makedirs(PLANS_DIR, exist_ok=True)
    path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
    print(f"wrote {path}")


def _er_frames(spark, n_docs: int = 100_000):
    """The bench pipeline's stage frames over the bench corpus (lazy)."""
    from mediachain_indexer_spark.operators.blocking import build_blocks
    from mediachain_indexer_spark.operators.normalize import normalize_documents
    from mediachain_indexer_spark.operators.pairs import candidate_pairs
    from mediachain_indexer_spark.operators.scoring import score_pairs
    from mediachain_indexer_spark.sources.fixtures import write_corpus
    from mediachain_indexer_spark.sources.io import read_documents

    paths = write_corpus(os.path.join(REPO, ".cache", f"fx{n_docs}"), n_docs)
    docs = read_documents(spark, paths["spans_documents"])
    feats = normalize_documents(docs).select("doc_id", "norm_text", "phashes")
    blocks = build_blocks(feats)
    pairs = candidate_pairs(blocks)
    scored = score_pairs(pairs, feats)
    return feats, blocks, pairs, scored


def cmd_plans(tag: str) -> None:
    spark = _spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mediachain_indexer_spark import catalog

    qs = catalog.queries()
    for name in (
        "agg_pricing_summary",
        "join_revenue_by_nation",
        "window_top3_orders_per_customer",
        "window_tumbling_events_10min",
        "embedding_cosine_topk",
        "similarity_ivf_topk",
        "dedup_exact_by_prefix",
    ):
        _write_plan(name, qs[name](spark, sf_dir), tag)

    feats, blocks, pairs, scored = _er_frames(spark)
    _write_plan("er_normalize", feats, tag)
    _write_plan("er_block", blocks, tag)
    _write_plan("er_pairs", pairs, tag)
    # score over materialized inputs (the bench shape: pairs+feats persisted)
    from mediachain_indexer_spark.operators.scoring import score_pairs

    fp = feats.persist()
    pp = pairs.persist()
    fp.count(), pp.count()
    _write_plan("er_score", score_pairs(pp, fp), tag)
    fp.unpersist(), pp.unpersist()
    spark.stop()


def cmd_pairs() -> None:
    """Decompose the pairs stage: where do the 3.9 s go?"""
    from pyspark.sql import functions as F

    from mediachain_indexer_spark.operators.pairs import (
        PairsConfig,
        _plain_pairs,
        _salted_pairs,
        _with_block_stats,
        candidate_pairs,
    )

    spark = _spark()
    feats, blocks, _, _ = _er_frames(spark)
    feats = feats.persist()
    blocks = blocks.persist()
    print("blocks rows:", blocks.count())

    cfg = PairsConfig()
    sc = spark.sparkContext

    # staged (cap window) alone
    staged = _with_block_stats(blocks, cfg)
    sc.setJobDescription("pairs: cap-window only")
    t = _noop(staged)
    print(f"cap-window noop: {t:.2f}s  rows={staged.count()}")

    staged_ck = staged.localCheckpoint(eager=False)
    sc.setJobDescription("pairs: staged materialize")
    t0 = time.monotonic()
    n_staged = staged_ck.count()
    print(f"staged localCheckpoint count: {time.monotonic()-t0:.2f}s rows={n_staged}")

    cols = ["block_key", "doc_id", "exact_hash"]
    small = staged_ck.where(F.col("bsize") <= cfg.salt_threshold).select(*cols)
    big = staged_ck.where(F.col("bsize") > cfg.salt_threshold).select(*cols)
    raw = _plain_pairs(small, True).unionByName(_salted_pairs(big, cfg, True))
    sc.setJobDescription("pairs: raw pairs (pre-dedup) noop")
    t = _noop(raw)
    print(f"raw-pairs noop: {t:.2f}s")
    sc.setJobDescription("pairs: raw pair count")
    t0 = time.monotonic()
    n_raw = raw.count()
    print(f"raw pair count: {n_raw} ({time.monotonic()-t0:.2f}s)")

    dedup = raw.dropDuplicates(["doc_a", "doc_b"])
    sc.setJobDescription("pairs: full (raw+dedup) noop")
    t = _noop(dedup)
    print(f"full pairs noop (from staged ckpt): {t:.2f}s")

    sc.setJobDescription("pairs: candidate_pairs end-to-end noop")
    t = _noop(candidate_pairs(blocks))
    print(f"candidate_pairs e2e noop: {t:.2f}s")

    # how many raw pairs per family?
    fam = (
        staged_ck.select(F.col("block_key").substr(1, 1).alias("f"),
                         F.col("bsize"))
        .groupBy("f")
        .agg(F.count("*").alias("members"),
             F.sum((F.col("bsize") - 1)).alias("sum_bm1"))
    )
    print("block family stats (members, sum(bsize-1) ~ 2x pairs):")
    for r in fam.collect():
        print("  ", r)
    spark.stop()


def cmd_stages() -> None:
    from pyspark.sql import functions as F

    from mediachain_indexer_spark.operators.cluster import (
        attach_components,
        connected_components,
    )

    spark = _spark()
    sc = spark.sparkContext
    feats, blocks, pairs, scored = _er_frames(spark)
    sc.setJobDescription("stage: normalize noop")
    print(f"normalize noop: {_noop(feats):.2f}s")
    feats = feats.persist()
    feats.count()
    sc.setJobDescription("stage: block noop (feats cached)")
    print(f"block noop: {_noop(blocks):.2f}s")
    blocks = blocks.persist()
    blocks.count()
    from mediachain_indexer_spark.operators.pairs import candidate_pairs

    p = candidate_pairs(blocks)
    sc.setJobDescription("stage: pairs noop (blocks cached)")
    print(f"pairs noop: {_noop(p):.2f}s")
    p = p.persist()
    p.count()
    from mediachain_indexer_spark.operators.scoring import score_pairs

    s = score_pairs(p, feats)
    sc.setJobDescription("stage: score noop (pairs+feats cached)")
    print(f"score noop: {_noop(s):.2f}s")
    s = s.persist()
    s.count()
    matches = s.where(F.col("is_match"))
    t0 = time.monotonic()
    n = matches.count()
    print(f"matches count: {n} ({time.monotonic()-t0:.2f}s)")
    sc.setJobDescription("stage: cluster")
    t0 = time.monotonic()
    clusters = attach_components(feats, connected_components(matches, n_edges=n))
    nc = clusters.count()
    print(f"cluster: {time.monotonic()-t0:.2f}s rows={nc}")
    spark.stop()


def cmd_queries() -> None:
    spark = _spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mediachain_indexer_spark import catalog

    qs = catalog.queries()
    for name in (
        "agg_pricing_summary",
        "join_revenue_by_nation",
        "window_top3_orders_per_customer",
        "window_tumbling_events_10min",
        "embedding_cosine_topk",
        "similarity_ivf_topk",
        "dedup_exact_by_prefix",
    ):
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warm
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            walls.append(round(time.monotonic() - t0, 3))
        print(f"{name}: {walls}")
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=("plans", "pairs", "stages", "queries"))
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()
    {
        "plans": lambda: cmd_plans(args.tag),
        "pairs": cmd_pairs,
        "stages": cmd_stages,
        "queries": cmd_queries,
    }[args.cmd]()
