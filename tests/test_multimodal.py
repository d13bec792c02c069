"""Multimodal plumbing: binary payloads through Arrow batches — decode/
feature-extract (1->1), frame sampling (1->N fan-out), resize (fixed-size
output). Decode itself is a deterministic fake (no codec libs in this
container); what these tests pin is the REAL part: schemas, batch shapes,
filters staying JVM-side, and byte-exact deterministic outputs."""

import pytest
from pyspark.sql import functions as F

from racket_linkeddata_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)

SF = "/root/testdata/sf0.01"


def _media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return synthesize_media(docs.filter(F.col("doc_id") < 120))


def test_extract_features_schema_and_determinism(spark):
    m = _media(spark)
    f1 = {r.media_id: (r.n_bytes, r.checksum, tuple(r.feat))
          for r in extract_features(m).collect()}
    f2 = {r.media_id: (r.n_bytes, r.checksum, tuple(r.feat))
          for r in extract_features(m).collect()}
    assert f1 == f2 and len(f1) == 120
    assert all(len(v[2]) == 8 for v in f1.values())


def test_sample_frames_fan_out_and_slices(spark):
    m = _media(spark)
    frames = sample_frames(m, every_ms=1000, max_frames=4,
                           frame_bytes=16).collect()
    videos = {r.media_id: (bytes(r.payload), r.meta_ms)
              for r in m.filter("kind = 'video'").collect()}
    assert frames, "no video rows sampled"
    got = {}
    for r in frames:
        got.setdefault(r.media_id, []).append(r)
    for mid, rows in got.items():
        payload, ms = videos[mid]
        expect_n = min(ms // 1000, 4)
        assert len(rows) == expect_n
        for r in sorted(rows, key=lambda x: x.frame_idx):
            assert r.ts_ms == r.frame_idx * 1000
            lo = r.frame_idx * 16
            assert bytes(r.frame_payload) == payload[lo:lo + 16]
    # only video rows fan out
    assert set(got) == {m_ for m_, (p, ms) in videos.items()
                        if ms >= 1000}


def test_resize_images_fixed_size_and_padding(spark):
    m = _media(spark)
    out = resize_images(m, width=8, height=8).collect()
    originals = {r.media_id: bytes(r.payload)
                 for r in m.filter("kind = 'image'").collect()}
    assert {r.media_id for r in out} == set(originals)
    for r in out:
        b = bytes(r.payload)
        assert len(b) == 64 and (r.width, r.height) == (8, 8)
        src = originals[r.media_id]
        assert b == (src[:64] + b"\x00" * max(0, 64 - len(src)))


def test_resize_real_mode_is_honestly_gated(spark):
    """mode='real' needs PIL; in this container that's a clearly-marked
    NotImplementedError, not a silent fake."""
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; real mode would engage")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        resize_images(_media(spark), mode="real")
