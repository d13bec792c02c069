"""Entity linking: canonicalize URIs against a broadcast alias dictionary.

The reference has no joins (SURVEY.md §2.3); this is the pipeline join the
north rule adds. The alias dictionary is small (dimension-table sized), so
the plan must be a broadcast hash join — no shuffle of the triples side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def link_entities(triples: DataFrame, aliases: DataFrame,
                  broadcast: bool = True) -> DataFrame:
    """Map subj/obj IRIs through aliases(mention, canon_uri).

    Unmatched IRIs keep their original value; literal objects
    (obj_kind=2) are never rewritten.

    ``broadcast=True`` (default) forces broadcast hash joins — the alias
    dictionary is dimension-table sized and the triples side must not
    shuffle. Pass False when the dictionary outgrows executor memory
    (hundreds of millions of mentions): the joins become shuffle joins
    on the mention key, which AQE will still convert back to broadcast
    if runtime statistics allow."""
    def _side(prefix):
        side = aliases.select(
            F.col("mention").alias(f"_{prefix}_mention"),
            F.col("canon_uri").alias(f"_{prefix}_canon"))
        return F.broadcast(side) if broadcast else side

    subj_alias = _side("subj")
    obj_alias = _side("obj")
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
