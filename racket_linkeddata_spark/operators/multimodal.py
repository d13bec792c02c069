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


FRAME_SCHEMA = ("media_id bigint, frame_idx int, ts_ms int, "
                "frame_payload binary")

RESIZED_SCHEMA = "media_id bigint, width int, height int, payload binary"


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling for video rows: ONE input row fans out to N frame
    rows (the 1->N Arrow batch shape real decoders need). Frame i is the
    deterministic fake decode of timestamp i*every_ms — a fixed-width
    byte window of the payload; a real deployment replaces the slice
    with an ffmpeg seek+decode at the same timestamps. Non-video rows
    are filtered BEFORE the Python boundary (predicate stays JVM-side,
    pushed into the scan when media comes straight off parquet)."""
    import pandas as pd

    def fn(batches):
        from .util import worker_runtime_tune
        worker_runtime_tune()
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [],
                   "frame_payload": []}
            for mid, payload, ms in zip(pdf["media_id"], pdf["payload"],
                                        pdf["meta_ms"]):
                b = bytes(payload)
                n_frames = min(int(ms) // every_ms, max_frames)
                for i in range(n_frames):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_payload"].append(
                        b[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(out)

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload", "meta_ms")
            .mapInPandas(fn, schema=FRAME_SCHEMA))


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  mode: str = "fake") -> DataFrame:
    """Image resize plumbing. ``mode="real"`` needs PIL (not in this
    container — raises NotImplementedError, clearly marked); the
    deterministic fake keeps the batch shape and schema real: output
    payload is exactly width*height bytes (truncate / zero-pad)."""
    import pandas as pd

    if mode == "real":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "resize_images(mode='real') requires PIL, which is not "
                "installed in this container; use the deterministic "
                "fake (mode='fake') or install codec libs") from e

    target = width * height

    def fn(batches):
        from .util import worker_runtime_tune
        worker_runtime_tune()
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)[:target]
                b = b + b"\x00" * (target - len(b))
                rows.append((int(mid), width, height, b))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "payload"])

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(fn, schema=RESIZED_SCHEMA))


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas. Batch shape:
    one pandas DataFrame per Arrow batch; payloads stay bytes end-to-end."""
    import pandas as pd

    def fn(batches):
        from .util import worker_runtime_tune
        worker_runtime_tune()
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
