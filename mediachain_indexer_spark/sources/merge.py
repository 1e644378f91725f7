"""Idempotent upsert (MERGE) sink — the R2/R10 writeback interface.

Parity: the reference's ingest and dedupe stages upsert documents / entity
assignments into Elasticsearch by ``_id`` (``mediachain/indexer/mc_ingest.py``
bulk upsert; ``mc_dedupe.py`` cluster writeback).  The Spark-native analog is
Iceberg ``MERGE INTO target USING updates ON key WHEN MATCHED UPDATE WHEN NOT
MATCHED INSERT``.

This sandbox has no Iceberg jar, so the same interface is implemented as a
*partition-scoped rewrite* over hive-partitioned parquet — which is exactly
what Iceberg's copy-on-write MERGE does under the hood:

- the target is partitioned by ``_bucket = pmod(xxhash64(key), n_buckets)``
  (prod: Iceberg hidden partitioning ``bucket(n_buckets, key)``);
- updates are bucketed the same way, so the set of *affected* partitions is
  the updates' distinct buckets (≤ n_buckets values — the only collect);
- merged rows = target-rows-in-affected-buckets ANTI-JOIN update keys,
  UNION update rows — reading ONLY the affected partitions (partition
  pruning on the filter);
- the write uses dynamic partition overwrite, replacing ONLY the affected
  bucket directories; untouched buckets are never read or rewritten.

At 10^12 docs with n_buckets=4096, an incremental upsert touching 1% of keys
rewrites ~all buckets unless keys cluster — size n_buckets so a typical
increment's buckets × bucket size ≈ the data you're willing to rewrite;
Iceberg's merge-on-read mode removes even that rewrite in prod.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_bucket"


def _with_bucket(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


def upsert_entities(
    updates: DataFrame,
    target_path: str,
    key_col: str = "doc_id",
    n_buckets: int = 16,
) -> dict[str, int]:
    """MERGE ``updates`` into the parquet table at ``target_path`` by key.

    Last-writer-wins per key (duplicate keys inside ``updates`` are reduced
    to one arbitrary-but-deterministic row first, like MERGE's
    cardinality check would force).  Idempotent: re-running the same upsert
    leaves the table unchanged.  Returns {n_upserted, n_buckets_touched}.
    """
    spark = updates.sparkSession
    updates = updates.dropDuplicates([key_col])
    upd = _with_bucket(updates, key_col, n_buckets)

    if not _table_exists(target_path):
        upd.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(target_path)
        if not _table_exists(target_path):
            # EMPTY updates write no bucket dirs — reading the bare
            # directory back would fail schema inference
            return {"n_upserted": 0, "n_buckets_touched": 0}
        return {
            "n_upserted": spark.read.parquet(target_path).count(),
            "n_buckets_touched": n_buckets,
        }

    upd = upd.persist()
    buckets = [r[0] for r in upd.select(BUCKET_COL).distinct().collect()]
    existing = spark.read.parquet(target_path).where(F.col(BUCKET_COL).isin(buckets))
    keep = existing.join(
        upd.select(F.col(key_col)), key_col, "left_anti"
    )
    merged = keep.unionByName(upd).localCheckpoint()  # cut lineage: the write
    # below overwrites partitions this plan reads (Iceberg snapshots make
    # this a metadata swap in prod; the sandbox materializes first)
    n = merged.count()
    (
        merged.write.partitionBy(BUCKET_COL)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(target_path)
    )
    upd.unpersist()
    return {"n_upserted": n, "n_buckets_touched": len(buckets)}


def delete_rows(
    spark: SparkSession,
    target_path: str,
    key_col: str,
    keys: DataFrame,
    n_buckets: int = 16,
) -> dict[str, int]:
    """MERGE-style DELETE: remove every row whose ``key_col`` appears in
    ``keys`` (Iceberg ``DELETE FROM target WHERE key IN (...)`` in prod).

    ``key_col`` need not be the bucketing key (the blocks table buckets on
    the composite ``bk_doc`` but deletes by ``doc_id``): affected buckets
    are discovered from the matching rows themselves (one semi-join scan),
    then only those buckets are rewritten.  A bucket whose rows are ALL
    deleted is removed outright — dynamic partition overwrite only replaces
    partitions present in the new data, so an emptied bucket would silently
    keep its old rows (Iceberg's snapshot delete handles this
    transactionally in prod; the sandbox removes the directory).
    Idempotent: re-deleting the same keys is a no-op.
    """
    import shutil

    if not _table_exists(target_path):
        return {"n_deleted": 0, "n_buckets_touched": 0}
    keys = keys.select(key_col).distinct()
    t = spark.read.parquet(target_path)
    hit = t.join(keys, key_col, "left_semi")
    buckets = [r[0] for r in hit.select(BUCKET_COL).distinct().collect()]
    if not buckets:
        return {"n_deleted": 0, "n_buckets_touched": 0}
    affected = t.where(F.col(BUCKET_COL).isin(buckets))
    keep = affected.join(keys, key_col, "left_anti").localCheckpoint()
    n_affected = affected.count()
    n_keep = keep.count()
    if n_keep:
        (
            keep.write.partitionBy(BUCKET_COL)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(target_path)
        )
    kept_buckets = {r[0] for r in keep.select(BUCKET_COL).distinct().collect()}
    for b in buckets:
        if b not in kept_buckets:
            shutil.rmtree(
                os.path.join(target_path, f"{BUCKET_COL}={b}"), ignore_errors=True
            )
    return {"n_deleted": n_affected - n_keep, "n_buckets_touched": len(buckets)}


def read_entities(spark: SparkSession, target_path: str) -> DataFrame:
    """Read back the upsert target without the internal bucket column."""
    df = spark.read.parquet(target_path)
    return df.drop(BUCKET_COL)


def _table_exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        name.startswith(BUCKET_COL + "=") for name in os.listdir(path)
    )
