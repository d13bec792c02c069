"""Watermarked event-time windowed aggregation over the page stream.

The crawl-monitoring companion to streaming ingest: per-(window, domain)
page counts on warc_ts event time. Late pages are handled by Spark's own
watermark state machine — a window closes (and its state is dropped)
once the watermark passes its end, so state is bounded by
(watermark horizon / window size) x active domains, not by stream
length. Out-of-order arrivals within the horizon still land in their
true event-time window (verified in tests with shuffled file delivery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def domain_of(url_col):
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)/", 1)


def windowed_domain_counts(pages_stream: DataFrame,
                           window: str = "1 minute",
                           watermark: str = "5 minutes") -> DataFrame:
    """Streaming (window, domain) page counts; append-mode compatible
    (rows emit once their window is finalized by the watermark)."""
    return (pages_stream
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"),
                     domain_of(F.col("url")).alias("domain"))
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.sum(F.length("text")).alias("n_chars"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "domain", "n_pages", "n_chars"))
