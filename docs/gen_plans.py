#!/usr/bin/env python3
"""Regenerate docs/PLANS.md: captured .explain('formatted') output for the
plan shapes that matter at scale (also pinned by tests/test_plans.py)."""

import contextlib
import io
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def cap(df, n=60):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return "\n".join(buf.getvalue().split("\n")[:n])


def main():
    import __spark_entry__ as em
    from racket_linkeddata_spark.operators.dedup import (
        dedup_triples, skolemize_bnodes)
    from racket_linkeddata_spark.operators.extract import (
        extract_triples, triples_only)
    from racket_linkeddata_spark.plans.kg import session

    spark = session("plans", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"

    sections = [
        ("Extraction (pages -> triples): no shuffle besides the "
         "small-input parallelism floor; only (url, html) cross the "
         "Arrow boundary",
         cap(extract_triples(em.doc_pages(spark, sf)), 40)),
        ("Dedup (skolemize -> edges): two-phase hash aggregate (partial "
         "map-side combine + final), whole-stage codegen around it",
         cap(dedup_triples(skolemize_bnodes(triples_only(
             extract_triples(em.doc_pages(spark, sf))))), 55)),
        ("Entity link: broadcast hash joins, zero sort-merge joins",
         cap(em.q_kg_entity_link(spark, sf), 70)),
        ("Dim joins + rollup (tpch_join): broadcast x2, pushdown + "
         "pruned ReadSchema",
         cap(em.q_tpch_join(spark, sf), 70)),
        ("MinHash-LSH candidates: ONE grouped aggregation over the band "
         "table (no self-join, no persist), grouped sorted-id pair "
         "generation, final distinct",
         cap(__import__(
             "racket_linkeddata_spark.operators.textstats",
             fromlist=["minhash_lsh_candidates"]).minhash_lsh_candidates(
                 spark.read.parquet(f"{sf}/documents.parquet")), 70)),
        ("ANN lsh_topk: candidate dedup carries (query_id, item_id) "
         "ONLY — no vector column in any aggregate key — then vectors "
         "re-join (corpus re-scan beats shuffling 64-double arrays)",
         cap((lambda e: __import__(
             "racket_linkeddata_spark.operators.similarity",
             fromlist=["lsh_topk"]).lsh_topk(
                 e, e.filter("vec_id < 5"), k=5))(
                     spark.read.parquet(f"{sf}/embeddings.parquet")), 80)),
        ("ANN ivf_topk: broadcast probe-cells join on cell id, NO "
         "dedup aggregate between probe and top-k (cells partition the "
         "corpus, so candidates are unique by construction)",
         cap((lambda e: __import__(
             "racket_linkeddata_spark.operators.similarity",
             fromlist=["ivf_topk"]).ivf_topk(
                 e, e.filter("vec_id < 5"), k=5))(
                     spark.read.parquet(f"{sf}/embeddings.parquet")), 80)),
        ("Language-ID model (lang_id_model): map-only — one Arrow "
         "pandas UDF over the scan, the only exchange is the "
         "small-input parallelism floor",
         cap(em.q_text_langid_model(spark, sf), 40)),
        ("BPE token pricing (bpe_token_count): map-only Arrow UDF, "
         "same shape",
         cap(em.q_text_tokens_bpe_real(spark, sf), 40)),
        ("Paragraph dedup (paragraph_dedup): global passage counts are "
         "a two-phase hash aggregate on pkey only (the shuffle carries "
         "32-char hashes, never text), hot set rides a BROADCAST "
         "left-anti join, one (doc_id) reassembly shuffle",
         cap(__import__(
             "racket_linkeddata_spark.operators.paragraphs",
             fromlist=["paragraph_dedup"]).paragraph_dedup(
                 spark.read.parquet(f"{sf}/documents.parquet")
                 .select("doc_id", "text"), min_repeat=5), 80)),
        ("Quality signals (quality_signals): pure JVM column algebra — "
         "no Python stage, no join/aggregate; one projection over the "
         "scan",
         cap(em.q_text_quality_signals(spark, sf), 40)),
    ]
    with open(os.path.join(HERE, "PLANS.md"), "w") as f:
        f.write("# Physical plans (captured via .explain('formatted') "
                "at sf0.01)\n\n")
        f.write("Regenerate: `python docs/gen_plans.py`. The properties "
                "asserted\nhere are pinned by tests/test_plans.py so "
                "refactors cannot\nsilently regress them.\n\n")
        for title, plan in sections:
            f.write(f"## {title}\n\n```\n{plan}\n```\n\n")
    spark.stop()


if __name__ == "__main__":
    main()
