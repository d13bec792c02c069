"""Materialized layout: bucketed edges/nodes, resume from the written log."""

from pyspark.sql import functions as F

from racket_linkeddata_spark.plans.kg import build_kg, materialize
from racket_linkeddata_spark.sources.pages import synthesize_pages


def test_materialize_and_resume(spark, tmp_path):
    pages = synthesize_pages(spark, 100, partitions=4).cache()
    kg = build_kg(pages, persist=False)
    out = str(tmp_path / "kg")
    materialize(kg, out, buckets=8)

    edges = spark.read.parquet(f"{out}/edges")
    assert edges.select("bucket").distinct().count() <= 8
    assert edges.count() == kg.edges.count()
    # partition pruning: a single-bucket read scans one partition dir
    one = edges.filter(F.col("bucket") == 3)
    assert one.count() == edges.filter("bucket = 3").count()

    log = spark.read.parquet(f"{out}/page_log")
    assert log.count() == 100

    # resume against the materialized log: nothing left to do
    kg2 = build_kg(pages, processed_log=log, persist=False)
    assert kg2.extracted.count() == 0
