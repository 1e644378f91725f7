"""Transitive clustering: accepted match edges → connected components.

Parity: the reference runs union-find over accepted pairs in driver memory
and writes a canonical dupe-cluster id per doc back to ES
(``mediachain/indexer/mc_dedupe.py``, ``dedupe_reindex``-style batch job).
A driver-memory union-find caps out at one machine; the Spark-first rebuild
is the **large-star / small-star** alternating algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14): O(log n) rounds of
pure DataFrame joins + min-aggregations, shuffling by node id each round.

Critical scale details:

- ``localCheckpoint`` every round truncates the logical plan — without it
  round N's plan embeds all N-1 prior joins and the driver dies on plan
  size (SURVEY.md §7.3);
- convergence is the star-forest property tested directly (one degree
  aggregate per round — see ``connected_components``), which stops the loop
  one full round earlier than change-detection schemes;
- ids are compared with natural ordering (doc_ids are zero-padded), and the
  final component id is the component *minimum* — a deterministic canonical
  id, independent of visit order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    und = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = und.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    # no distinct here: duplicates are absorbed by small-star's groupBy
    # (min is duplicate-insensitive) — saves one full shuffle per iteration
    return (
        und.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small; connect all smaller neighbors (and u) to min.

    No ``distinct`` on the output (it used to cost one full exchange per
    round): duplicates are absorbed by the NEXT round's groupBy minima on
    both star sides, the convergence test is duplicate-insensitive by
    construction, and the final member/root extraction dedups once at the
    end.  Measured on the 100k bench graph: 4.6s → 3.9s for the loop.
    """
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    to_min = (
        oriented.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    u_to_min = mins.select(F.col("u"), F.col("m").alias("v"))
    return to_min.unionByName(u_to_min)


def _n_star_violations(edges: DataFrame) -> int:
    """Nodes violating the star-forest property, via ONE groupBy:

    - more than one DISTINCT parent (min(parent) ≠ max(parent)), or
    - a parent AND an inbound edge (a 2-hop chain u→v→w).

    Zero violations ⇔ every component is a single star.  The chain test
    alone is NOT enough: small★ can emit a multi-parent vertex with no
    chain (e.g. {(3,1),(5,1),(3,2),(6,2)} — node 3 has parents 1 and 2,
    yet no v appears as a u), and that state is not a fixpoint.  Distinct
    parents via min≠max (not a count) keeps the test correct on the
    duplicate edges ``_small_star`` now leaves in the stream.
    """
    nodes = edges.select(
        F.col("u").alias("k"), F.col("v").alias("pv"), F.lit(0).alias("i")
    ).unionByName(
        edges.select(
            F.col("v").alias("k"),
            F.lit(None).cast(edges.schema["v"].dataType).alias("pv"),
            F.lit(1).alias("i"),
        )
    )
    deg = nodes.groupBy("k").agg(
        F.min("pv").alias("mn"), F.max("pv").alias("mx"), F.sum("i").alias("ind")
    )
    return deg.where(
        (F.col("mn") != F.col("mx"))
        | (F.col("mn").isNotNull() & (F.col("ind") > 0))
    ).count()


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """edges(src, dst) → (doc_id, entity_id) for every node in the edge set.

    entity_id = min node id of the component.  Nodes absent from ``edges``
    (singletons) are the caller's to add — see ``attach_components``.

    Latency engineering: the loop is round-trip-bound, not data-bound —
    each round is a handful of small shuffles whose cost is task-launch
    latency.  Two levers:

    (a) convergence is the STAR-FOREST property itself, not fingerprint
        stability across rounds: after any large★/small★ round every edge
        points larger→smaller, so an edge set with no 2-hop chain and no
        multi-parent member (``_n_star_violations`` == 0) is a min-rooted
        star forest — which is exactly the algorithm's fixpoint (both
        operators preserve connectivity, so each star is a whole component,
        and the root, being smaller than every member, is the component
        min).  Testing the property directly stops the loop the moment the
        answer exists; the old fingerprint-equality scheme needed one extra
        full round just to observe that nothing changed (measured on the
        100k bench graph: 2 rounds instead of 3-4, 6.4s → 2.8s,
        bit-identical output).  The violation-count groupBy doubles as the
        action that materializes the round's lazy localCheckpoint — one
        Spark job per round.
    (b) the loop runs at its own DATA-sized shuffle width: the edge set is
        counted once up front (which doubles as the materialization of the
        entry checkpoint) and the width is ~1 partition per 300k edges,
        clamped to [8, max(16, 2×parallelism)] — a 340k-edge graph loops at
        8 partitions instead of 32+, roughly halving per-round task-launch
        overhead, while a 6.7M-edge graph still gets the full width.  At
        real scale pass ``shuffle_partitions`` explicitly (conf restored
        after).
    """
    spark = edges.sparkSession
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # no entry distinct (it was a full shuffle of the edge set): the
        # rounds are duplicate-insensitive end to end — groupBy minima
        # absorb dup edges, the violations test counts DISTINCT parents,
        # and the final extraction dedups — so duplicate input edges only
        # pad round 1's volume.  ER callers pass already-distinct pairs.
        e = (
            edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .where(F.col("u") != F.col("v"))
            .localCheckpoint(eager=False)
        )
        if shuffle_partitions:
            cc_parts = shuffle_partitions
        else:
            width_cap = min(
                int(old_shuffle), max(16, spark.sparkContext.defaultParallelism * 2)
            )
            n_edges = e.count()  # materializes the entry checkpoint
            cc_parts = min(width_cap, max(8, -(-n_edges // 300_000)))
        spark.conf.set("spark.sql.shuffle.partitions", str(cc_parts))
        converged = False
        for _ in range(max_iter):
            e = _small_star(_large_star(e)).localCheckpoint(eager=False)
            if _n_star_violations(e) == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components: no convergence in {max_iter} iters"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)

    # converged edge set is a star forest: (member, root) with root < member
    members = e.select(F.col("u").alias("doc_id"), F.col("v").alias("entity_id"))
    roots = e.select(F.col("v").alias("doc_id"), F.col("v").alias("entity_id"))
    return members.unionByName(roots).distinct()


def attach_components(all_docs: DataFrame, components: DataFrame) -> DataFrame:
    """(doc_id) × (doc_id, entity_id) → every doc with an entity id.

    Singletons (docs in no accepted pair) become their own entity — the same
    canonical-id convention (min doc_id = itself).
    """
    return all_docs.select("doc_id").join(components, "doc_id", "left").select(
        "doc_id", F.coalesce("entity_id", "doc_id").alias("entity_id")
    )
