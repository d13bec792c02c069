"""Watermarked event-time windows: out-of-order delivery lands in the
true event-time window; append mode emits once windows finalize."""

import datetime as dt

from pyspark.sql import functions as F

from racket_linkeddata_spark.streaming.ingest import stream_pages
from racket_linkeddata_spark.streaming.windows import (
    domain_of, windowed_domain_counts)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _page(i, minute, second, domain):
    ts = T0 + dt.timedelta(minutes=minute, seconds=second)
    return (f"https://{domain}/p/{i}", ts, b"<html></html>",
            f"text {i}", "en")


def test_windowed_counts_out_of_order_delivery(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "win")
    ckpt = str(tmp_path / "ckpt")
    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")

    # three files delivered OUT of event-time order: minute-2 data first,
    # then minute-0 (late but within the 5-minute watermark horizon),
    # then minute-1 + a far-future flush row that finalizes everything
    f1 = [_page(i, 2, i, "a.example.org") for i in range(10)]
    f2 = [_page(100 + i, 0, i, "b.example.org") for i in range(7)]
    f3 = ([_page(200 + i, 1, i, "a.example.org") for i in range(5)]
          + [_page(999, 60, 0, "flush.example.org")])
    for batch in (f1, f2, f3):
        spark.createDataFrame(batch, schema).coalesce(1) \
            .write.mode("append").parquet(pages_dir)

    counts = windowed_domain_counts(
        stream_pages(spark, pages_dir, max_files_per_trigger=1),
        window="1 minute", watermark="5 minutes")
    q = (counts.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r.window_start.minute, r.domain): (r.n_pages, r.n_chars)
           for r in spark.read.parquet(out).collect()
           if r.domain != "flush.example.org"}
    # batch-side truth over the same files
    batch = spark.read.parquet(pages_dir).filter(
        ~F.col("url").contains("flush"))
    want = {(r.m, r.domain): (r.n, r.c) for r in
            (batch.groupBy(F.minute(F.window("warc_ts", "1 minute")
                                    .start).alias("m"),
                           domain_of(F.col("url")).alias("domain"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.length("text")).alias("c"))).collect()}
    assert got == want
    assert got[(2, "a.example.org")][0] == 10
    assert got[(0, "b.example.org")][0] == 7  # late data, right window
    assert got[(1, "a.example.org")][0] == 5
