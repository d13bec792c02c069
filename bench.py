#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...}

The headline KG job synthesizes a deterministic pages corpus sized
relative to the sf dir (20x documents rows) covering the full per-document
surface (bnodes, lists, named graphs, reverse props, malformed pages) and
measures end-to-end triples/sec of extract -> skolemize -> dedup.

Scaling evidence (north rule: N vs 4N executors -> ==local[8] vs
local[32] here) is produced by bench_scaling.py, which shells out to this
file with --cpus {8,32} --only kg_build.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def run(cpus: int, sf_dir: str, only=None, n_pages=None, reps: int = 3,
        skip_calibration: bool = False):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from bench_scaling import calibrate
    from racket_linkeddata_spark.plans.kg import build_kg, session
    from racket_linkeddata_spark.sources.pages import synthesize_pages

    # Self-calibration: this host is co-tenant-shared (advertises 32
    # cores; a 32-process pure-CPU burn has measured 9-28 effective
    # cores depending on hypervisor weather). Every artifact carries its
    # own denominator: effective parallelism of a pure-Python CPU burn
    # measured immediately BEFORE and AFTER the timed suite. Best-of-N
    # query timing picks the quietest rep, so max(pre, post) is the
    # matching denominator for the headline; both are recorded.
    cal_pre = None if skip_calibration else calibrate(cpus)

    spark = session("bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_pages = n_pages or n_docs * 20

    timings = {}
    spreads = {}
    extra = {}

    def timed(name, fn):
        if only and name not in only:
            return
        best = float("inf")
        worst = 0.0
        out = None
        for _ in range(reps):  # best-of: damps co-tenant host noise
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            worst = max(worst, dt)
        timings[name] = round(best, 3)
        spreads[name] = round(worst - best, 3)
        # cross-query hygiene: release the previous query's
        # localCheckpoint blocks (held until Python GC drops the DF)
        # so later queries aren't taxed by earlier queries' storage
        import gc
        gc.collect()
        return out

    # synthesize the pages corpus to parquet once, OUTSIDE the timed
    # section (production pages arrive as an Iceberg/parquet table; the
    # bench measures the engine, not the generator)
    pages_path = f"/tmp/bench_pages_{n_pages}"
    if not os.path.exists(pages_path):
        (synthesize_pages(spark, n_pages, partitions=cpus * 2)
         .write.mode("overwrite").parquet(pages_path))

    # warm the Python workers once with a full untimed pass: production
    # executors are long-lived; per-worker daemon spin-up (~10s across the
    # fleet) is not engine throughput. limit() warm-ups only touch one
    # worker — it must be a full-parallelism pass.
    if not only or "kg_build" in only:
        from racket_linkeddata_spark.operators.extract import extract_triples
        extract_triples(spark.read.parquet(pages_path)).count()

    def kg_build():
        pages = spark.read.parquet(pages_path)
        kg = build_kg(pages, staging_path=f"/tmp/bench_staged_{cpus}")
        n_triples = kg.edges.count()
        n_raw = kg.lineage.agg({"triple_count": "sum"}).first()[0]
        extra["n_pages"] = n_pages
        extra["n_edges"] = n_triples
        extra["n_raw_triples"] = int(n_raw)
        return n_raw

    if not only or "kg_build" in only:
        # best-of-N to damp shared-host scheduling noise
        best = float("inf")
        worst = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            kg_build()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            worst = max(worst, dt)
        timings["kg_build"] = round(best, 3)
        spreads["kg_build"] = round(worst - best, 3)
    if "kg_build" in timings:
        extra["triples_per_sec"] = round(
            extra["n_raw_triples"] / timings["kg_build"], 1)
        extra["pages_per_sec"] = round(n_pages / timings["kg_build"], 1)

    queries = entry_mod.queries()
    for name in ["kg_triples", "kg_edges", "kg_page_log", "kg_rdfa",
                 "kg_microdata",
                 "dedup_minhash_lsh", "dedup_text_pipeline",
                 "training_data_prep", "train_prep_packed",
                 "dedup_url_canonical",
                 "dedup_ngram_jaccard", "dedup_paragraphs",
                 "dedup_passage_stats",
                 "dedup_simhash", "dedup_embedding_lsh",
                 "text_fingerprint", "text_tokens",
                 "text_tokens_bpe_real",
                 "text_langid", "text_langid_model",
                 "text_repetition", "text_redact_pii",
                 "text_quality_signals",
                 "text_decontaminate", "text_decontam_fuzzy",
                 "text_mixture_stats", "text_blocklist",
                 "dedup_spans",
                 "train_pack_offsets", "train_pack_greedy",
                 "text_lm_surprisal", "text_bigram_surprisal",
                 "text_tfidf", "text_textrank",
                 "sketch_hll_summary", "sketch_cms",
                 "sketch_cms_estimate", "corpus_quantiles", "corpus_quantiles_by_source",
                 "text_split", "split_leak_check", "text_quota_sample",
                 "text_nfc_normalize",
                 "ann_brute_topk", "ann_lsh_topk",
                 "ann_ivf_topk", "ann_ivf_kmeans", "ann_pq_topk",
                 "ann_ivf_pq_topk",
                 "multimodal_frames", "tpch_q1", "tpch_join", "tpch_q3",
                 "events_window", "events_asof"]:
        timed(name, lambda n=name: queries[n](spark, sf_dir).count())

    spark.stop()
    cal_post = None if skip_calibration else calibrate(cpus)

    result = {
        "metric": "kg_construct headline: end-to-end canonical triples/sec "
                  "+ operator latencies",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "query_spread_sec": spreads,  # worst-best across reps, per query
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": cpus,
        **extra,
    }
    if not skip_calibration:
        # the artifact's own denominator: effective cores of a pure-CPU
        # process burn at the same worker count, measured before/after
        # the suite. best-of-N picks the quietest rep, so the max is the
        # honest ceiling to read throughput against (1.0 = all
        # advertised cores actually granted by the hypervisor).
        result["calibration"] = {
            "effective_cores_pre": cal_pre,
            "effective_cores_post": cal_post,
            "cpu_ceiling": round(max(cal_pre, cal_post) / cpus, 3),
        }
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--sf-dir",
                   default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                          "/root/testdata/sf0.1"))
    p.add_argument("--only", nargs="*", default=None)
    p.add_argument("--n-pages", type=int, default=None)
    # 3 reps: best-of needs >=2 warm reps on the co-tenant host — the
    # round-3 driver snapshot regressed 4-17% on five queries purely
    # from scheduling noise that a third rep absorbs
    p.add_argument("--reps", type=int, default=3)
    # bench_scaling.py runs its own interleaved calibration around the
    # levels; its child invocations skip the per-run one
    p.add_argument("--skip-calibration", action="store_true")
    args = p.parse_args()
    result = run(args.cpus, args.sf_dir, args.only, args.n_pages, args.reps,
                 skip_calibration=args.skip_calibration)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
