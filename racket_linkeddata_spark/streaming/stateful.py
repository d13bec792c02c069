"""Custom stateful streaming operator: cross-micro-batch url dedup.

applyInPandasWithState keeps a per-key seen-set so re-crawled pages are
dropped exactly once across the whole stream (the streaming counterpart of
the batch anti-join resume). Keys are url-hash buckets, so state shards
evenly across executors regardless of domain skew.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")
STATE_SCHEMA = "seen array<long>"


def _dedup_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        # 64-bit url fingerprints keep state tiny (vs storing url strings)
        import hashlib

        fps = pdf["url"].map(
            lambda u: int.from_bytes(
                hashlib.blake2b(u.encode(), digest_size=8).digest(),
                "big", signed=True))
        # drop both cross-batch repeats (state) and intra-chunk repeats
        fresh = ~fps.isin(seen) & ~fps.duplicated()
        seen.update(int(x) for x in fps[fresh])
        out = pdf[fresh].drop(columns=["bucket"])  # key col not in output
        if len(out):
            yield out
    state.update((sorted(seen),))


def dedup_pages_stream(pages_stream: DataFrame,
                       buckets: int = 64) -> DataFrame:
    """Streaming exactly-once-per-url page feed."""
    keyed = pages_stream.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(buckets)))
    return (keyed.groupBy("bucket")
            .applyInPandasWithState(
                _dedup_group,
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout)
            )
