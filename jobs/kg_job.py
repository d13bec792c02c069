#!/usr/bin/env python3
"""spark-submit entry point for the KG-construction pipeline.

    spark-submit --driver-memory 8g --py-files rls.zip jobs/kg_job.py \
        --pages <pages parquet/Iceberg path> --out <output dir> \
        [--staging <staging path>] [--resume] [--n-synth 10000]

With --n-synth and no --pages, synthesizes the deterministic test corpus
first (sandbox use). --warc <dir> reads raw Common-Crawl-style
.warc/.warc.gz files instead of a parquet pages table (one file = one
task). --resume anti-joins against <out>/page_log from a previous run
before processing. --stream runs the Structured Streaming ingest over
the --pages/--warc directory instead (exactly-once per file via the
stream checkpoint; re-invoke to drain newly arrived files).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pages")
    p.add_argument("--warc", help="directory/glob of .warc/.warc.gz "
                   "files to read as the pages input")
    p.add_argument("--out", required=True)
    p.add_argument("--staging")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--compact", action="store_true",
                   help="fold resume snapshots into snap=0 after the run "
                        "(Iceberg rewriteDataFiles stand-in)")
    p.add_argument("--n-synth", type=int)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--stream", action="store_true",
                   help="run as a Structured Streaming ingest instead "
                        "of a batch build: drain the --pages/--warc "
                        "directory (availableNow) into the same "
                        "(snap,bucket) store; the stream checkpoint at "
                        "<out>/_checkpoint makes re-invocation process "
                        "only newly arrived files (so --resume/--compact "
                        "do not apply)")
    args = p.parse_args()

    if args.stream:
        # validate BEFORE the JVM spins up: these are usage errors
        if args.resume or args.compact or args.n_synth:
            raise SystemExit("--stream takes --pages or --warc only "
                             "(checkpoint IS the resume mechanism)")
        if args.pages and args.warc:
            # silently preferring one would parse the other directory
            # with the wrong reader (review r05a: parquet bytes through
            # parse_warc "succeed" as an empty KG)
            raise SystemExit("--stream: give --pages OR --warc, not both")
        if not (args.pages or args.warc):
            raise SystemExit("--stream needs --pages or --warc")

    # Deployment-agnostic session: no master/memory pinning here (that's
    # spark-submit's job on a cluster), but DO bound the Arrow batch
    # size: page rows carry multi-KB html binaries, and the default
    # 10000-row batches x 32 concurrent tasks exhaust the JVM's direct
    # memory arena (reproduced at 1.2M pages: netty OutOfDirectMemoryError
    # at the 1 GiB default). 2048-row batches keep per-task buffers a few
    # MB regardless of page size. driver.memory here is effective ONLY
    # when this script is launched as a plain python process (the JVM
    # starts inside getOrCreate, and local-mode executors live in that
    # JVM — without it a million-page run OOMs the default ~1g heap,
    # reproduced at 600k pages). Under spark-submit the builder value is
    # ignored because the JVM is already up — pass --driver-memory 8g on
    # the submit command line (see the module docstring).
    spark = (SparkSession.builder.appName("kg-construct")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.files.openCostInBytes",
                     str(128 * 1024 * 1024))
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    from racket_linkeddata_spark.plans.kg import build_kg, materialize
    from racket_linkeddata_spark.sources.pages import synthesize_pages

    if args.stream:
        path = args.pages or args.warc
        from racket_linkeddata_spark.plans.kg import read_edges
        from racket_linkeddata_spark.streaming.ingest import run_ingest_kg
        q = run_ingest_kg(spark, path, args.out,
                          f"{args.out}/_checkpoint",
                          buckets=args.buckets,
                          source="warc" if args.warc else "parquet")
        q.awaitTermination()
        try:
            n = read_edges(spark, args.out).count()
        except Exception:
            # zero micro-batches fired (nothing in the input dir yet):
            # the store was never created — that is a valid drain
            n = 0
        print(f"kg-construct done: {n} edges at {args.out} (streamed)")
        spark.stop()
        return

    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.warc:
        from racket_linkeddata_spark.sources.warc import read_warc
        pages = read_warc(spark, args.warc)
    elif args.n_synth:
        pages = synthesize_pages(spark, args.n_synth)
    else:
        raise SystemExit("need --pages, --warc or --n-synth")

    processed_log = None
    snapshot_id = 0
    if args.resume:
        # page_log and lineage are read in SEPARATE try blocks: if
        # page_log exists but lineage is missing/corrupt (crash between
        # materialize's two writes), falling back to overwrite would
        # destroy every prior snapshot on a --resume invocation. Abort
        # instead and let the operator decide.
        try:
            # pin the prior log eagerly: this job appends to
            # <out>/page_log later, and a lazily-read directory listing
            # could otherwise be re-listed mid-append if a cache-evicted
            # stage recomputes the resume anti-join
            processed_log = spark.read.parquet(
                f"{args.out}/page_log").localCheckpoint(eager=True)
        except Exception:
            processed_log = None  # first run: nothing to resume from
        if processed_log is not None:
            try:
                prior = spark.read.parquet(f"{args.out}/lineage") \
                    .agg({"snapshot_id": "max"}).collect()[0][0]
                snapshot_id = (prior if prior is not None else -1) + 1
            except Exception:
                raise SystemExit(
                    f"--resume: {args.out}/page_log exists but "
                    f"{args.out}/lineage is unreadable — refusing to "
                    "fall back to overwrite (it would destroy prior "
                    "snapshots). Repair/remove the output dir or rerun "
                    "without --resume to rebuild from scratch.")

    kg = build_kg(pages, processed_log=processed_log,
                  staging_path=args.staging, snapshot_id=snapshot_id)
    materialize(kg, args.out, buckets=args.buckets,
                mode="append" if args.resume and processed_log is not None
                else "overwrite")
    from racket_linkeddata_spark.plans.kg import compact_snapshots, read_edges
    if args.compact:
        compact_snapshots(spark, args.out)
    n = read_edges(spark, args.out).count()
    print(f"kg-construct done: {n} edges at {args.out} "
          f"(snapshot {snapshot_id})")
    spark.stop()


if __name__ == "__main__":
    main()
