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

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the converged per-node aggregate backing the most recent
# connected_components result stays cached until the NEXT call (the caller
# materializes the returned projection lazily); bounded to one call's worth.
# _CC_LOCK serializes the unpersist/append hand-off: without it, concurrent
# calls from multiple driver threads could interleave the sequence and leak
# (or double-release) a frame.  Contract for callers: materialize a result
# BEFORE issuing the next connected_components call if you want the final
# projection to be a cache read — a later call may evict the aggregate, in
# which case the projection recomputes through the held checkpoint blocks
# (correct, just slower).
_CC_LOCK = threading.Lock()
_CC_FINAL_CACHES: list[DataFrame] = []


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


def _star_stats(edges: DataFrame) -> DataFrame:
    """Per-node min/max UNDIRECTED neighbor — the one aggregate each star op
    needs (see the loop in ``connected_components``): ``(u, mn, mx)``."""
    und = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return und.groupBy("u").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))


def _star_degrees(edges: DataFrame) -> DataFrame:
    """Per-node star-forest state, via ONE groupBy:
    ``(k, mn=min parent, mx=max parent, ind=#inbound edges)``.

    This frame answers BOTH questions the loop asks:

    - convergence (``_violations``): a node violates the star-forest
      property iff it has more than one DISTINCT parent (mn ≠ mx) or a
      parent AND an inbound edge (a 2-hop chain u→v→w);
    - the final assignment: once converged, every node appears exactly once
      here, members carry their root in ``mn`` and roots carry ``mn`` null —
      so ``(k, coalesce(mn, k))`` IS the component table, and the old
      members∪roots ``distinct`` extraction (one more full shuffle of the
      edge set) is unnecessary.
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
    return nodes.groupBy("k").agg(
        F.min("pv").alias("mn"), F.max("pv").alias("mx"), F.sum("i").alias("ind")
    )


def _violations(deg: DataFrame) -> DataFrame:
    """Star-forest violations from a ``_star_degrees`` frame.

    Zero rows ⇔ every component is a single star.  The chain test alone is
    NOT enough: small★ can emit a multi-parent vertex with no chain (e.g.
    {(3,1),(5,1),(3,2),(6,2)} — node 3 has parents 1 and 2, yet no v
    appears as a u), and that state is not a fixpoint.  Distinct parents
    via min≠max (not a count) keeps the test correct on the duplicate edges
    ``_small_star`` leaves in the stream.
    """
    return deg.where(
        (F.col("mn") != F.col("mx"))
        | (F.col("mn").isNotNull() & (F.col("ind") > 0))
    )


def _n_star_violations(edges: DataFrame) -> int:
    return _violations(_star_degrees(edges)).count()


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    shuffle_partitions: int | None = None,
    n_edges: int | None = None,
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
        bit-identical output).  One undirected min/max-neighbor groupBy
        per star op (``_star_stats``) serves the convergence test AND both
        ops' minima, its count doubles as the action that materializes the
        op's lazy checkpoint — one Spark job per op — and on the converged
        op the aggregate IS the component assignment, read back out of its
        cache instead of re-shuffling the edge set through a members∪roots
        distinct.  Ops alternate small★-first (see the loop comment).
    (b) the loop runs at its own DATA-sized shuffle width: ~1 partition per
        300k edges, clamped to [8, max(16, 2×parallelism)] — a 340k-edge
        graph loops at 8 partitions instead of 32+, roughly halving
        per-round task-launch overhead, while a 6.7M-edge graph still gets
        the full width.  Callers that already know the edge count (the
        bench counts matches right before clustering; incremental ingest
        counts its delta) pass ``n_edges`` and the sizing count() — one
        whole job over the match table — disappears.  At real scale pass
        ``shuffle_partitions`` explicitly (conf restored after).
    """
    import os as _os
    import time as _time

    _dbg = bool(_os.environ.get("SPARK_GRAFT_CC_DEBUG"))
    _t_enter = _time.monotonic()
    spark = edges.sparkSession
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    _cached: list[DataFrame] = []
    try:
        # AQE off for the loop (restored after): each round is a fixed
        # 5-exchange DAG over hand-sized partitions, and AQE's per-exchange
        # re-planning barrier adds ~35% wall at bench scale (measured
        # 3.7s → 2.4s warm on the 337k-edge graph) while buying nothing —
        # the aggregations are partial-agg (map-side combine) so value skew
        # on hot node ids never concentrates a shuffle, and the loop width
        # is already data-sized below.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # no entry distinct (it was a full shuffle of the edge set): the
        # rounds are duplicate-insensitive end to end — groupBy minima
        # absorb dup edges, the violations test counts DISTINCT parents,
        # and the final assignment reads the converged groupBy — so
        # duplicate input edges only pad round 1's volume.  ER callers pass
        # already-distinct pairs.
        e = (
            edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .where(F.col("u") != F.col("v"))
            .localCheckpoint(eager=False)
        )
        if shuffle_partitions:
            cc_parts = shuffle_partitions
        else:
            if n_edges is None:
                n_edges = e.count()  # materializes the entry checkpoint
            width_cap = min(
                int(old_shuffle), max(16, spark.sparkContext.defaultParallelism * 2)
            )
            cc_parts = min(width_cap, max(8, -(-n_edges // 300_000)))
        spark.conf.set("spark.sql.shuffle.partitions", str(cc_parts))
        if _dbg:
            print(f"[cc] setup: {_time.monotonic() - _t_enter:.2f}s", flush=True)

        # Ground BOTH the plan and the statistics each op.  localCheckpoint
        # truncates the logical plan — REQUIRED every op, not periodically:
        # each op's plan references the previous edge frame ~4× (undirected
        # union + the stats join), so Catalyst's tree-walk cost between
        # truncations grows 4^k per op and a round-6 experiment that
        # checkpointed only every 8th op hung the 300-node path-graph test
        # in analysis before the first truncation (do not retry).  The lazy
        # LogicalRDD INHERITS the child plan's sizeInBytes estimate, and
        # every join SQUARES that estimate: the bit-length of the stat
        # doubles per op (measured: 496 → 989 → 1977 → 3952 → 7902 bits
        # over five ops) until BigInteger stats math OOMs the driver around
        # op ~25 — a latent bug at high diameters under the old per-round
        # loop too (max_iter=50 was unreachable).  A persist() over the
        # checkpointed frame fixes it: after the count materializes the
        # cache, planning sees the InMemoryRelation's REAL byte size
        # (measured: flat 11 bits every op) — which also lets JoinSelection
        # broadcast the per-node minima when they are genuinely small and
        # shuffle when they are not.
        def _ground(df: DataFrame) -> DataFrame:
            g = df.localCheckpoint(eager=False).persist()
            _cached.append(g)
            return g

        comp = None
        # small★ FIRST: convergence is order-independent (both ops preserve
        # connectivity; the fixpoint test is exact), but the starting op is
        # not free — ER match graphs are near-cliques, which one small★
        # collapses almost entirely (measured on the 337k-edge bench graph:
        # small-first converges in 3 ops vs large-first's 4, loop wall
        # 1.9s vs 2.6s), and on path graphs large★ is a no-op anyway.
        op_large = False
        for _op in range(2 * max_iter):
            _t0 = _time.monotonic()
            # ONE undirected groupBy per star op, triple duty:
            # (a) convergence check — min-rooted star forest ⇔ no node has
            #     a smaller neighbor AND distinct min/max neighbors
            #     (mn < u ⇒ member, needs exactly one distinct neighbor);
            # (b) large★ minima — m(u) = least(mn, u);
            # (c) small★ minima — min SMALLER neighbor = mn whenever
            #     mn < u, which covers every u-side of the oriented view.
            # The old shape paid a separate deg groupBy per composite round
            # (5 exchanges per 2 ops + check); this is 2 per op with the
            # check free, and the loop can exit at half-round boundaries.
            # persist WITHOUT localCheckpoint: stats' child is already the
            # checkpointed e (an RDD scan, one level deep), so there is no
            # plan growth to truncate — and localCheckpoint(eager=False)
            # converts to an RDD at CALL time, paying a synchronous
            # driver-side Catalyst planning pass (~0.1-0.2s each; measured
            # ~0.85s/call across the loop's six grounded frames).  The
            # persist still grounds sizeInBytes for JoinSelection.
            stats = _star_stats(e).persist()
            _cached.append(stats)
            _nv = stats.where(
                (F.col("mn") < F.col("u")) & (F.col("mn") != F.col("mx"))
            ).count()
            if _dbg:
                print(
                    f"[cc] op {_op} ({'large' if op_large else 'small'}): "
                    f"{_time.monotonic() - _t0:.2f}s viol={_nv} parts={cc_parts} "
                    f"abs={_time.monotonic() - _t_enter:.2f}",
                    flush=True,
                )
            if _nv == 0:
                # stats has every node exactly once; members (mn < u) carry
                # their root in mn, roots (mn > u) map to themselves.  The
                # result is a narrow projection of the cached aggregate:
                # ownership of that cache moves to the last-call registry
                # (released at the NEXT call) so the caller's first
                # materialization is a cache read, with no extra job here.
                # If a later call evicts it first, the projection recomputes
                # as one groupBy over the held checkpoint blocks — correct,
                # just slower.
                comp = stats.select(
                    F.col("u").alias("doc_id"),
                    F.least("u", "mn").alias("entity_id"),
                )
                _cached.remove(stats)
                if _dbg:
                    print(
                        f"[cc] comp built: {_time.monotonic() - _t0:.2f}s",
                        flush=True,
                    )
                with _CC_LOCK:
                    for _old in _CC_FINAL_CACHES:
                        _old.unpersist()
                    _CC_FINAL_CACHES.clear()
                    _CC_FINAL_CACHES.append(stats)
                if _dbg:
                    print(
                        f"[cc] registry swap: {_time.monotonic() - _t0:.2f}s",
                        flush=True,
                    )
                break
            if op_large:
                und = e.select("u", "v").unionByName(
                    e.select(F.col("v").alias("u"), F.col("u").alias("v"))
                )
                mins = stats.select("u", F.least("mn", "u").alias("m"))
                e = (
                    und.join(mins, "u")
                    .where(F.col("v") > F.col("u"))
                    .select(F.col("v").alias("u"), F.col("m").alias("v"))
                )
            else:
                oriented = e.select(
                    F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
                )
                mins = stats.where(F.col("mn") < F.col("u")).select(
                    "u", F.col("mn").alias("m")
                )
                e = (
                    oriented.join(mins, "u")
                    .where(F.col("v") != F.col("m"))
                    .select(F.col("v").alias("u"), F.col("m").alias("v"))
                    .unionByName(mins.select("u", F.col("m").alias("v")))
                )
            e = _ground(e)
            # frames older than the live window {e_prev, stats, e_new} are
            # only reachable through checkpoint blocks now — drop their
            # cache layer so the loop holds O(1) frames however many ops run
            while len(_cached) > 3:
                _cached.pop(0).unpersist()
            op_large = not op_large
        if comp is None:
            raise RuntimeError(
                f"connected_components: no convergence in {max_iter} iters"
            )
    finally:
        _t_fin = _time.monotonic()
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        for _df in _cached:
            _df.unpersist()
        if _dbg:
            print(f"[cc] finally: {_time.monotonic() - _t_fin:.2f}s", flush=True)
    if _dbg:
        print(f"[cc] total: {_time.monotonic() - _t_enter:.2f}s", flush=True)
    return comp


def attach_components(all_docs: DataFrame, components: DataFrame) -> DataFrame:
    """(doc_id) × (doc_id, entity_id) → every doc with an entity id.

    Singletons (docs in no accepted pair) become their own entity — the same
    canonical-id convention (min doc_id = itself).

    ``all_docs`` only needs a ``doc_id`` column: pass the pipeline's
    PERSISTED features frame (1:1 with the raw docs) rather than the raw
    source so the final join reads the cache instead of re-scanning parquet.
    """
    return all_docs.select("doc_id").join(components, "doc_id", "left").select(
        "doc_id", F.coalesce("entity_id", "doc_id").alias("entity_id")
    )
