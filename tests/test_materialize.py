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


def test_sql_views(spark):
    from racket_linkeddata_spark.plans.kg import register_views

    pages = synthesize_pages(spark, 60, partitions=4)
    kg = build_kg(pages, persist=False)
    register_views(kg)
    top = spark.sql("""
        SELECT pred, count(*) AS n FROM kg_edges
        GROUP BY pred ORDER BY n DESC, pred LIMIT 3""").collect()
    assert len(top) == 3 and top[0].n >= top[1].n
    joined = spark.sql("""
        SELECT count(*) AS n FROM kg_edges e
        JOIN kg_nodes s ON e.subj = s.canon_uri""").first().n
    assert joined == spark.sql("SELECT count(*) FROM kg_edges").first()[0]
