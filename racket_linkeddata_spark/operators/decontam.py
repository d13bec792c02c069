"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation/benchmark corpus (the GPT-3 appendix-C /
PaLM decontamination shape: any 13-gram collision marks the training
doc). The standard pre-training step the pipeline was missing next to
dedup and quality filtering.

No reference counterpart (racket-linkeddata does no text analysis);
LLM-pipeline brief.

100 TB shape:
- the benchmark side is SMALL by nature (eval sets are MBs): its
  distinct n-gram set is broadcast, so the contaminated-gram probe is a
  map-side hash join — the training corpus's exploded n-grams are
  filtered to hits BEFORE the only shuffle;
- the only shuffle is the per-doc hit count over hit rows (a vanishing
  fraction of the corpus), plus the left join back to doc ids;
- per-doc total gram counts come from size(shingles) map-side — the
  full gram stream never aggregates globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import shingles


def contamination_stats(docs: DataFrame, benchmark: DataFrame,
                        n: int = 13, *, min_hits: int = 1,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_grams, n_hits, is_contaminated) for every training
    document: distinct word ``n``-grams, how many of them occur in the
    benchmark corpus, and the ``>= min_hits`` verdict. Documents
    shorter than ``n`` tokens have 0 grams and are never contaminated
    (matching shingles' short-doc guard).

    ``benchmark`` only needs ``text_col``; it is reduced to its
    distinct n-gram set and broadcast — callers with a multi-GB
    "benchmark" should pre-shard it instead.

    ``docs`` is referenced by two branches (the gram explode and the
    per-doc gram-count base) — pass a pinned/cheap lineage, or the
    upstream plan evaluates twice (the repo's self-join-over-expensive-
    trees gotcha)."""
    bench_grams = (benchmark
                   .select(F.explode(shingles(benchmark, n, text_col))
                           .alias("g"))
                   .distinct())
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(shingles(docs, n, text_col)).alias("g"))
    hits = (doc_grams
            .join(F.broadcast(bench_grams), "g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))
    base = docs.select(
        F.col(id_col),
        F.size(shingles(docs, n, text_col)).cast("bigint")
        .alias("n_grams"))
    return (base
            .join(hits, id_col, "left")
            .select(id_col, "n_grams",
                    F.coalesce("n_hits", F.lit(0)).cast("bigint")
                    .alias("n_hits"))
            .withColumn("is_contaminated",
                        F.col("n_hits") >= min_hits))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = 13, *, min_hits: int = 1,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """The filter face: training docs with NO benchmark collision
    (``n_hits < min_hits``). Returns the input columns of survivors.

    Anti-joins on the CONTAMINATED id set rather than inner-joining on
    the clean set (review r06b): a NULL-``id_col`` row can never be
    attributed a hit (contamination_stats' id-keyed left join reports
    it n_hits=0), so an inner join that silently dropped it diverged
    from the stats face and from the SQL ``ANTI JOIN`` replica. This
    also skips the per-doc gram-count branch entirely — the
    contaminated set needs only the (tiny) hit aggregate."""
    bench_grams = (benchmark
                   .select(F.explode(shingles(benchmark, n, text_col))
                           .alias("g"))
                   .distinct())
    contam = (docs.select(F.col(id_col),
                          F.explode(shingles(docs, n, text_col))
                          .alias("g"))
              .join(F.broadcast(bench_grams), "g")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_hits"))
              .filter(F.col("n_hits") >= min_hits)
              .select(id_col))
    return docs.join(contam, id_col, "left_anti")
