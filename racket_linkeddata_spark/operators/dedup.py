"""Triple-level dedup + blank-node skolemization.

Blank-node labels are per-document (``_:c14n<N>``), so a naive global
dropDuplicates would wrongly merge distinct bnodes from different pages.
We skolemize labels content-addressed — ``_:<canon_hash32>.c14n<N>`` — so:

- bnodes from different documents never collide, and
- *identical documents* (same canonical form, e.g. mirrored pages) get
  identical labels and collapse in the global dedup for free.

Collision budget: the prefix is 32 hex chars = 128 bits of the
document's canonical SHA-256. At the north star's 10^12 documents the
expected number of cross-document prefix collisions is n^2 / 2^129
~ 10^-15 — negligible. (A 16-char/64-bit prefix birthday-collides at
that scale: ~10^4 expected silent bnode merges.)

All of it is JVM-side column algebra (whole-stage codegen), no UDF.
The global dedup is a hash aggregate: Spark already executes it as the
north rule's two-phase dedup (map-side partial aggregate -> AQE-managed
shuffle -> final aggregate), and counting sources rides the same shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIPLE_KEY = ["subj", "pred", "obj_kind", "obj_value", "obj_dt",
              "obj_lang", "graph"]


def _skolemize(col: str, canon_hash: str = "canon_hash"):
    c = F.col(col)
    return F.when(
        c.startswith("_:"),
        F.concat(F.lit("_:"), F.substring(canon_hash, 1, 32), F.lit("."),
                 F.substring(c, 3, 1 << 20)),
    ).otherwise(c)


def skolemize_bnodes(triples: DataFrame) -> DataFrame:
    """Rewrite per-document bnode labels into globally-unique,
    content-addressed labels."""
    out = triples.withColumn("subj", _skolemize("subj"))
    out = out.withColumn(
        "obj_value",
        F.when(F.col("obj_kind") == 1,
               _skolemize("obj_value")).otherwise(F.col("obj_value")))
    if "graph" in triples.columns:
        out = out.withColumn("graph", _skolemize("graph"))
    return out


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Global set-semantics dedup (n-quads.rkt:336-351 at cluster scale):
    ONE hash-aggregate keyed on the full triple. n_sources uses count(*)
    — exact because the extraction stage already enforces per-document set
    semantics, so each (url, triple) pair occurs once; count_distinct
    would add an expensive expand + second aggregation for nothing."""
    return (triples
            .groupBy(*TRIPLE_KEY)
            .agg(F.count(F.lit(1)).alias("n_sources")))
