"""Graph operators for the dedup endgame: near-dup PAIRS -> connected
components -> one keeper per cluster.

connected_components is min-label propagation accelerated with pointer
jumping (label <- label-of-label), the classic PRAM trick that makes a
depth-d component converge in O(log d) rounds instead of O(d) — a pure
neighbor-min loop is linear in chain length, which is exactly the shape
adversarial near-dup chains (a->a'->a''...) take on web corpora:

- each vertex starts labeled with itself;
- every round, each vertex takes the min label among itself and its
  neighbors (one join + one map-side-combinable min aggregate), then
  jumps: label <- label[label] (one more equi-join);
- stop when no label changed (count of changed rows — one cheap action
  per round) or after ``max_iter`` rounds.

Each round the label table is localCheckpoint'ed (eager): iterative
lineage otherwise grows a nested plan per round — re-analysis cost grows
without bound and deep loops overflow Catalyst. At production scale this
is a reliable-checkpoint (or staging-table write) instead of a
localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_iter: int = 25) -> DataFrame:
    """(id, cluster_id) for every id appearing in ``pairs``; cluster_id
    is the minimum id of the component."""
    edges = (pairs.select(F.col(a_col).alias("src"),
                          F.col(b_col).alias("dst"))
             .unionByName(pairs.select(F.col(b_col).alias("src"),
                                       F.col(a_col).alias("dst")))
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("label", F.col("id"))
              .localCheckpoint(eager=True))
    try:
        for _ in range(max_iter):
            neighbor_min = (edges.join(labels,
                                       edges.dst == labels.id, "inner")
                            .groupBy("src")
                            .agg(F.min("label").alias("nmin")))
            stepped = (labels.join(neighbor_min,
                                   labels.id == neighbor_min.src, "left")
                       .select(
                           "id",
                           F.least("label",
                                   F.coalesce("nmin", "label"))
                           .alias("label")))
            # pointer jump: label <- label[label] (labels are ids, and
            # every label value is itself a vertex in the table)
            lut = stepped.select(F.col("id").alias("lid"),
                                 F.col("label").alias("llabel"))
            new_labels = (stepped.join(
                lut, stepped.label == lut.lid, "left")
                .select("id",
                        F.coalesce("llabel", "label").alias("label"))
                .localCheckpoint(eager=True))
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "id")
                       .filter(F.col("n.label") != F.col("o.label"))
                       .count())
            labels = new_labels
            if changed == 0:
                break
        return labels.select("id", F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist()


def dedup_keepers(pairs: DataFrame, all_ids: DataFrame,
                  id_col: str = "doc_id", a_col: str = "doc_a",
                  b_col: str = "doc_b") -> DataFrame:
    """The dedup endgame: every id with a keep/drop verdict. Ids in a
    near-dup cluster keep only the minimum id; ids with no near-dup
    keep themselves."""
    comp = connected_components(pairs, a_col, b_col)
    return (all_ids.select(F.col(id_col).alias("id"))
            .join(comp, "id", "left")
            .select(
                F.col("id").alias(id_col),
                F.coalesce("cluster_id", "id").alias("cluster_id"),
                (F.coalesce("cluster_id", "id") == F.col("id"))
                .alias("keep")))
