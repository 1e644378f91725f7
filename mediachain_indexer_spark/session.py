"""SparkSession factory with the engine's standard configuration.

Scale rationale (tuned for a 1000-executor cluster, tested on local[N]):

- AQE on, with skew-join splitting and partition coalescing: the LSH-band
  self-join has power-law block sizes; AQE splits oversized shuffle
  partitions at runtime, on top of our explicit salting/size-cap
  (operators/blocking.py).
- Arrow everything: the only JVM→Python crossings are Arrow-batched
  pandas_udfs (Jaro-Winkler) — never row-at-a-time Python.
- Nested-schema pruning: the blocking stage must read only `spans.text`
  / `spans.media_ref` leaves out of the interleaved spans struct, not the
  whole array blob.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _heap_gb(heap: str) -> float:
    """Parse a JVM memory spec ('16g', '16384m') to GB for the pretouch
    heuristic.  Unknown/malformed specs (empty env var, '1,5g', bare 'g')
    return 0.0 — pretouch stays off and Spark's own config validation
    reports the bad value with its usual error."""
    try:
        if heap and heap[-1] in "gG":
            return float(heap[:-1])
        if heap and heap[-1] in "mM":
            return float(heap[:-1]) / 1024
    except ValueError:
        pass
    return 0.0


def get_spark(
    app_name: str = "mediachain-indexer-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    set_master: bool = True,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``cores=None`` → ``local[$SPARK_GRAFT_CPUS or *]``.  Under
    ``spark-submit`` pass ``set_master=False`` so the launcher's ``--master``
    wins (jobs/dedupe_job.py does); the confs below are master-agnostic.
    """
    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env_cores}]" if env_cores else "local[*]"
    else:
        master = f"local[{cores}]"

    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = SparkSession.builder.appName(app_name)
    if set_master:
        builder = builder.master(master)
    builder = (
        builder
        # --- adaptive execution: runtime re-planning for skew + small shuffles
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # --- join strategy: feature/dim relations are small relative to the
        # pair table; let Spark (and AQE at runtime) flip SMJ → broadcast-hash
        # up to 128 MB — at 10^12-doc scale the stats exceed this and the
        # shuffle join is chosen automatically
        .config("spark.sql.autoBroadcastJoinThreshold", "128m")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "128m")
        # --- Arrow: vectorized pandas_udf transfer; cap batch memory
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- nested column pruning through the spans array<struct>
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # --- deterministic sessions: no timezone surprises in goldens
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    # Pre-size (and pre-fault) the driver/executor heap the way a production
    # executor runs (-Xms == -Xmx): lazy heap growth turns the first timed
    # reps into kernel page-zeroing storms on this sandbox's VM (measured
    # 2026-08-17: vmstat `sy` 40-78% during rep 1-2, first-rep e2e 24.6s vs
    # 12.4s warm without the flags; 17.3s vs 12.0s with them — BENCH/
    # BASELINE.md "host-state" note).  AlwaysPreTouch moves the fault-in to
    # JVM startup, outside any timed region.  Auto-disabled for large-heap
    # probes where the shuffle tmpfs and the heap share physical RAM and an
    # eagerly resident heap would add OOM pressure (the 16M-doc probe).
    heap = os.environ.get("SPARK_DRIVER_MEM", "16g")
    pretouch = os.environ.get("SPARK_GRAFT_PRETOUCH", "auto")
    heap_gb = _heap_gb(heap)
    if pretouch == "1" or (pretouch == "auto" and 0 < heap_gb <= 24):
        builder = builder.config(
            "spark.driver.extraJavaOptions", f"-Xms{heap} -XX:+AlwaysPreTouch"
        )
    # shuffle spill dir: prefer RAM-backed tmpfs over the shared root disk —
    # the sandbox analog of the fast local NVMe a real executor would have.
    # Concurrent shuffle writers on a slow disk anti-scale with core count.
    # SPARK_GRAFT_LOCAL_DIR overrides (comma-separated list round-robins
    # block files across dirs) — needed when a single-box probe's shuffle
    # footprint would compete with the JVM heap for the same physical RAM:
    # at 16M docs the tmpfs shuffle peaked >59 GB alongside a 60 GB heap
    # and the kernel OOM-killed the JVM; splitting tmpfs+disk halves the
    # RAM-resident share.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    else:
        shm = "/dev/shm"
        if os.path.isdir(shm) and os.access(shm, os.W_OK):
            builder = builder.config("spark.local.dir", os.path.join(shm, "spark-local"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
