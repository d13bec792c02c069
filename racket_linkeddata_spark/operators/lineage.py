"""Per-partition lineage + metrics (north rule: input split, triple count,
canon hash per partition; resume via anti-join on processed urls).

The canon hash folds each document's canonical-N-Quads sha256 with
xxhash64 — order-insensitive (sum over a group is commutative) so the
rollup is a pure map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def page_log(extracted: DataFrame) -> DataFrame:
    """One row per processed url (including empty/error pages):
    url, n_triples, canon_hash, status."""
    return extracted.groupBy("url").agg(
        F.count("subj").alias("n_triples"),
        F.first("canon_hash", ignorenulls=True).alias("canon_hash"),
        F.min("status").alias("status"),
    )


def partition_lineage(extracted: DataFrame, snapshot_id: int = 0) -> DataFrame:
    """Per-input-partition lineage rows (FIXTURES.md §3 lineage schema)."""
    return (
        extracted
        .withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.lit(snapshot_id).alias("snapshot_id"),
            F.min("url").alias("url_min"),
            F.max("url").alias("url_max"),
            F.count("subj").alias("triple_count"),
            # decimal(38) sum: order-insensitive and ANSI-overflow-safe
            F.sum(F.xxhash64(F.coalesce("canon_hash", F.lit("")))
                  .cast("decimal(38,0)")).alias("canon_hash_fold"),
        )
    )


def resume_filter(pages: DataFrame, processed_log: DataFrame) -> DataFrame:
    """Checkpoint resume: drop pages whose url already appears in a
    previous run's page log (left anti join; Iceberg MERGE at production
    scale, parquet snapshot in the sandbox)."""
    return pages.join(processed_log.select("url"), on="url", how="left_anti")
