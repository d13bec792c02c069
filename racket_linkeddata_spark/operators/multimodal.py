"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode libraries (PIL/ffmpeg/librosa) are not in this container, so
decode is STUBBED behind a deterministic fake (clearly marked), but the
Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partition behavior — is real and tested. Swap `_fake_decode` for a real
decoder on a cluster with the codec libs installed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id bigint, kind string, payload binary, "
                "meta_width int, meta_height int, meta_ms int")

FEATURE_SCHEMA = ("media_id bigint, kind string, n_bytes int, "
                  "checksum bigint, feat array<float>")


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from documents: payload =
    utf-8 text bytes, metadata derived arithmetically (SQL-replicable)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 640).cast("int").alias("meta_width"),
        (F.col("n_chars") % 480).cast("int").alias("meta_height"),
        (F.col("n_chars") * 33).cast("int").alias("meta_ms"),
    )


def _fake_decode(payload: bytes, dim: int = 8):
    """STUB decoder: deterministic pseudo-features from payload bytes.
    A real deployment raises NotImplementedError here without codec libs;
    the fake keeps the pipeline testable end-to-end."""
    n = len(payload)
    checksum = 0
    for i in range(0, n, max(1, n // 64)):
        checksum = (checksum * 1099511628211 + payload[i]) % (1 << 63)
    feat = [((checksum >> (i * 7)) % 1000) / 1000.0 for i in range(dim)]
    return n, checksum, feat


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas. Batch shape:
    one pandas DataFrame per Arrow batch; payloads stay bytes end-to-end."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                n, checksum, feat = _fake_decode(bytes(payload), dim)
                rows.append((int(mid), kind, n, checksum, feat))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "n_bytes", "checksum", "feat"])

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURE_SCHEMA)
