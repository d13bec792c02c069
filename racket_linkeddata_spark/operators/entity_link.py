"""Entity linking: canonicalize URIs against a broadcast alias dictionary.

The reference has no joins (SURVEY.md §2.3); this is the pipeline join the
north rule adds. The alias dictionary is small (dimension-table sized), so
the plan must be a broadcast hash join — no shuffle of the triples side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def link_entities(triples: DataFrame, aliases: DataFrame) -> DataFrame:
    """Map subj/obj IRIs through aliases(mention, canon_uri).

    Unmatched IRIs keep their original value; literal objects
    (obj_kind=2) are never rewritten.
    """
    subj_alias = F.broadcast(
        aliases.select(F.col("mention").alias("_subj_mention"),
                       F.col("canon_uri").alias("_subj_canon")))
    obj_alias = F.broadcast(
        aliases.select(F.col("mention").alias("_obj_mention"),
                       F.col("canon_uri").alias("_obj_canon")))
    out = (
        triples
        .join(subj_alias, triples.subj == subj_alias._subj_mention, "left")
        .join(obj_alias,
              (triples.obj_kind == F.lit(0))
              & (triples.obj_value == obj_alias._obj_mention), "left")
        .withColumn("subj", F.coalesce("_subj_canon", "subj"))
        .withColumn("obj_value", F.coalesce("_obj_canon", "obj_value"))
        .drop("_subj_mention", "_subj_canon", "_obj_mention", "_obj_canon")
    )
    return out
