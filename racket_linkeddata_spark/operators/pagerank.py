"""PageRank over an arbitrary weighted edge table, and TextRank
(Mihalcea & Tarau 2004) keyword scoring built on it — both in SCALED
INTEGER arithmetic so every iteration is exactly SQL-replicable:

    rank_0(v)   = scale                         (1.0 fixed-point)
    contrib(e)  = (rank(src) * w(e)) div outw(src)
    rank_i+1(v) = ((100-d)*scale) div 100
                  + (d * sum(contribs into v)) div 100

Integer division at each step, damping as an integer percentage —
no float drift, and integer sums are order-independent, so Spark's
parallel aggregation and DuckDB's serial one agree to the last bit.
The oracle replays the SAME fixed number of iterations as unrolled
chained CTEs (a recursive CTE cannot aggregate over its own
reference).

Semantics notes (all standard simplifications, all documented):
- Dangling nodes (no out-edges) leak their mass — ranks are relative
  salience scores, not a probability distribution.
- The node set is the union of edge endpoints; an isolated node (in
  no edge) has no rank row.
- Overflow bound: rank <= n_nodes * scale in the worst case, so
  choose scale with n_nodes * scale * max_weight < 2^63 (the default
  1e6 scale is safe past 10^9 nodes with small weights).

No reference counterpart (racket-linkeddata has no graph analytics);
graph centrality over the constructed KG and TextRank keywording are
both squarely in the engine brief.

100 TB shape: the edge table is joined with per-source out-weight
ONCE and localCheckpointed (every iteration consumes it — unpinned,
the prep join re-runs per round; the graph.py pointer-jumping
precedent), each iteration is one src equi-join + one dst two-phase
aggregate + one left join back to nodes, and each round's ranks are
localCheckpointed so the loop never grows a nested plan (the repo's
persist-loop gotcha). Rank state is node-sized, edges are never
collected.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F



def pagerank(edges: DataFrame, *, iterations: int = 5,
             damping_pct: int = 85, scale: int = 1_000_000,
             src_col: str = "src", dst_col: str = "dst",
             weight_col: Optional[str] = None) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of integer-scaled
    power iteration. ``weight_col=None`` means unit weights (plain
    out-degree split). Weights must be a positive INTEGRAL column —
    a fractional weight would truncate to 0 under the bigint cast and
    silently zero that edge's (and possibly its source's whole)
    contribution, so fractional types are rejected at plan time and
    non-positive values fail the job loudly (review r06e). Edges with
    a NULL endpoint are malformed and rejected the same way — a
    silent drop would also vanish nodes reachable only through them."""
    if iterations < 1:
        raise ValueError(f"pagerank: iterations must be >= 1, "
                         f"got {iterations}")
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"pagerank: damping_pct must be in [0, 100], "
                         f"got {damping_pct}")
    if scale < 1:
        raise ValueError(f"pagerank: scale must be >= 1, got {scale}")

    if weight_col is not None:
        # Spark-resolved dtype — a dict(dtypes) lookup is
        # case-sensitive while column resolution is not (review r06f)
        try:
            dt = (edges.select(F.col(weight_col))
                  .schema[0].dataType.simpleString())
        except Exception as exc:
            raise ValueError(
                f"pagerank: weight_col {weight_col!r} not found in "
                f"edges ({edges.columns})") from exc
        if dt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"pagerank: weight_col {weight_col!r} must be an "
                f"integral column (got {dt}); rescale fractional "
                f"weights to integers first — the bigint cast would "
                f"truncate them to 0")
        w = F.col(weight_col).cast("bigint")
        w = (F.when(w >= 1, w)
             .otherwise(F.raise_error(F.concat(
                 F.lit("pagerank: weights must be >= 1, got "),
                 F.coalesce(F.col(weight_col).cast("string"),
                            F.lit("NULL"))))))
    else:
        w = F.lit(1).cast("bigint")
    null_end = F.col(src_col).isNull() | F.col(dst_col).isNull()
    e = edges.select(
        F.when(~null_end, F.col(src_col))
        .otherwise(F.raise_error(F.lit(
            "pagerank: edge with NULL src/dst"))).alias("src"),
        F.col(dst_col).alias("dst"),
        w.alias("w"))

    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    # pinned once: all `iterations` rounds consume this join — left
    # unpinned it would re-run per round (and the whole upstream edge
    # derivation with it)
    prepped = e.join(outw, "src").localCheckpoint()

    nodes = (prepped.select(F.col("src").alias("node"))
             .union(prepped.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint())

    base = ((100 - damping_pct) * scale) // 100
    ranks = nodes.select("node",
                         F.lit(scale).cast("bigint").alias("rank"))
    for _ in range(iterations):
        sums = (prepped
                .join(ranks, prepped["src"] == ranks["node"])
                .select(F.col("dst"),
                        F.expr("(rank * w) div outw").alias("contrib"))
                .groupBy("dst")
                .agg(F.sum("contrib").alias("in_mass")))
        ranks = (nodes
                 .join(sums, nodes["node"] == sums["dst"], "left")
                 .select(
                     "node",
                     (F.lit(base)
                      + F.expr(f"({damping_pct} * coalesce(in_mass, 0))"
                               f" div 100"))
                     .cast("bigint").alias("rank"))
                 # eager pin per round: without it the loop nests the
                 # full join tree `iterations` deep (the CC gotcha)
                 .localCheckpoint())
    return ranks


def token_cooccurrence_edges(docs: DataFrame, *,
                             text_col: str = "text") -> DataFrame:
    """(src, dst, w): the TextRank word graph — adjacent-token pairs
    (window 2), undirected (both directions emitted), self-loops
    dropped, weight = corpus-wide co-occurrence count. Tokenization
    shared with lmscore/tfidf. Pure JVM: the pair list is a
    slice+zip over the token array, no positional self-join."""
    from .lmscore import adjacent_pairs_array

    # shared tokenizer barrier + zip-slice (lmscore; review r06i);
    # both directions INSIDE the array before the single explode — a
    # directed.union(reversed) would re-derive the whole pair subtree
    # (tokenizer and Generates twice; the double-evaluation gotcha)
    arr = adjacent_pairs_array(docs, text_col, [])
    both = F.flatten(F.transform(
        F.col("_pairs"),
        lambda p: F.array(p, F.struct(p["b"].alias("a"),
                                      p["a"].alias("b")))))
    return (arr
            .select(F.explode(both).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
            .agg(F.count(F.lit(1)).alias("w")))


def textrank_scores(docs: DataFrame, *, iterations: int = 5,
                    damping_pct: int = 85, scale: int = 1_000_000,
                    text_col: str = "text") -> DataFrame:
    """(term, rank): TextRank keyword salience over the corpus-wide
    word co-occurrence graph — weighted PageRank in integer fixed
    point. Tokens that never co-occur with a DIFFERENT adjacent token
    (isolated single-token documents) have no graph presence and no
    row."""
    edges = token_cooccurrence_edges(docs, text_col=text_col)
    ranks = pagerank(edges, iterations=iterations,
                     damping_pct=damping_pct, scale=scale,
                     weight_col="w")
    return ranks.select(F.col("node").alias("term"), "rank")
