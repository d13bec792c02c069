#!/usr/bin/env python3
"""spark-submit entry point for the KG-construction pipeline.

    spark-submit --py-files rls.zip jobs/kg_job.py \
        --pages <pages parquet/Iceberg path> --out <output dir> \
        [--staging <staging path>] [--resume] [--n-synth 10000]

With --n-synth and no --pages, synthesizes the deterministic test corpus
first (sandbox use). --resume anti-joins against <out>/page_log from a
previous run before processing.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pages")
    p.add_argument("--out", required=True)
    p.add_argument("--staging")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--n-synth", type=int)
    p.add_argument("--buckets", type=int, default=64)
    args = p.parse_args()

    spark = SparkSession.builder.appName("kg-construct").getOrCreate()
    from racket_linkeddata_spark.plans.kg import build_kg, materialize
    from racket_linkeddata_spark.sources.pages import synthesize_pages

    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.n_synth:
        pages = synthesize_pages(spark, args.n_synth)
    else:
        raise SystemExit("need --pages or --n-synth")

    processed_log = None
    if args.resume:
        try:
            processed_log = spark.read.parquet(f"{args.out}/page_log")
        except Exception:
            processed_log = None  # first run

    kg = build_kg(pages, processed_log=processed_log,
                  staging_path=args.staging)
    materialize(kg, args.out, buckets=args.buckets,
                mode="append" if args.resume and processed_log is not None
                else "overwrite")
    n = spark.read.parquet(f"{args.out}/edges").count()
    print(f"kg-construct done: {n} edges at {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
