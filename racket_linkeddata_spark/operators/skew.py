"""Explicit skew handling: salted two-phase aggregation.

AQE's skew handling covers joins and (post-3.4) some aggregates, but a
deliberately salted two-phase aggregate is the portable answer for
hot-key rollups (mega-domain urls, celebrity-entity subjects): phase 1
aggregates on (key, salt) — hot keys split across `salt_buckets`
reducers — phase 2 merges the partials. Works for any algebraic
aggregate; exposed here for count/sum.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def salted_agg(df: DataFrame, keys: List[str],
               salt_buckets: int = 64,
               counts: bool = True,
               sums: Optional[List[str]] = None) -> DataFrame:
    """Two-phase (salted local combine -> global merge) aggregate."""
    sums = sums or []
    salt = (F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id(),
                       F.monotonically_increasing_id())
            % salt_buckets).alias("_salt")
    phase1_aggs = []
    if counts:
        phase1_aggs.append(F.count(F.lit(1)).alias("_cnt"))
    for c in sums:
        phase1_aggs.append(F.sum(c).alias(f"_sum_{c}"))
    partial = (df.withColumn("_salt", salt)
               .groupBy(*keys, "_salt").agg(*phase1_aggs))
    phase2_aggs = []
    if counts:
        phase2_aggs.append(F.sum("_cnt").alias("n"))
    for c in sums:
        phase2_aggs.append(F.sum(f"_sum_{c}").alias(f"sum_{c}"))
    return partial.groupBy(*keys).agg(*phase2_aggs)


def domain_of(url_col) -> "F.Column":
    """Extract the domain from a url (the skew key for web corpora)."""
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)/", 1)
