"""Stateful streaming dedup: re-delivered urls are dropped across
micro-batches via applyInPandasWithState."""

from racket_linkeddata_spark.sources.pages import synthesize_pages
from racket_linkeddata_spark.streaming.ingest import stream_pages
from racket_linkeddata_spark.streaming.stateful import dedup_pages_stream


def test_stateful_url_dedup(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt")

    base = synthesize_pages(spark, 40, partitions=2)
    base.write.parquet(pages_dir, mode="overwrite")
    # re-deliver the same 40 pages as new files + 20 genuinely new ones
    base.write.mode("append").parquet(pages_dir)
    extra = synthesize_pages(spark, 60, partitions=2) \
        .subtract(base)
    extra.write.mode("append").parquet(pages_dir)

    deduped = dedup_pages_stream(stream_pages(spark, pages_dir))
    q = (deduped.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    assert got.select("url").distinct().count() == 60
    assert got.count() == 60  # duplicates dropped, not just distinct-ed
