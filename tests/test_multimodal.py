"""Multimodal plumbing: binary payload columns through mapInPandas, frame
sampling plans, strict-mode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_to_redshift_with_airflow_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_features,
    sample_video_frames,
    with_size_buckets,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes 1", ("image/png", 10, 10, None)),
        (2, "image", b"\x89PNG other payload", ("image/png", 20, 20, None)),
        (3, "image", None, ("image/png", None, None, None)),
        (4, "video", b"\x00\x00ftyp fake", ("video/mp4", 640, 480, 3500)),
        (5, "audio", b"RIFF fake", ("audio/wav", None, None, 2000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_image_features_deterministic(media):
    out = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert set(out) == {1, 2, 3}  # only images
    assert out[1]["n_bytes"] == 17
    assert len(out[1]["embedding"]) == 8
    assert all(0.0 <= v <= 1.0 for v in out[1]["embedding"])
    assert out[1]["digest"] != out[2]["digest"]
    assert out[3]["n_bytes"] == 0 and out[3]["digest"] is None  # null payload
    # determinism: second run bit-identical
    again = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert {k: v["digest"] for k, v in out.items()} == {
        k: v["digest"] for k, v in again.items()
    }


def test_decode_strict_raises_not_implemented(media):
    with pytest.raises(Exception, match="NotImplementedError|not in container"):
        decode_image_features(media, strict=True).collect()


def test_sample_video_frames(media):
    rows = sample_video_frames(media, every_ms=1000, max_frames=16).collect()
    # 3500ms at 1 frame/s → frames at 0,1000,2000,3000
    assert [r["offset_ms"] for r in rows] == [0, 1000, 2000, 3000]
    assert all(r["media_id"] == 4 for r in rows)


def test_size_buckets_bounded(media):
    out = with_size_buckets(media, n_buckets=8).select("size_bucket").collect()
    assert all(r["size_bucket"] is None or 0 <= r["size_bucket"] < 8 for r in out)


def test_decode_audio_chunks(media):
    from s3_to_redshift_with_airflow_spark.operators.multimodal import (
        decode_audio_chunks,
    )

    rows = decode_audio_chunks(media, chunk_ms=1000, max_chunks=12).collect()
    # media 5: 2000ms at 1s chunks → offsets 0,1000,2000 (floor(2000/1000)+1)
    assert [r["offset_ms"] for r in rows] == [0, 1000, 2000]
    assert all(r["media_id"] == 5 for r in rows)
    digests = [r["chunk_digest"] for r in rows]
    assert len(set(digests)) == 3  # offset folded into the digest
    assert all(0 <= r["energy"] < 1000 for r in rows)
    # determinism: second run bit-identical
    again = decode_audio_chunks(media, chunk_ms=1000, max_chunks=12).collect()
    assert [r["chunk_digest"] for r in again] == digests


def test_decode_audio_chunks_strict_raises(media):
    from s3_to_redshift_with_airflow_spark.operators.multimodal import (
        decode_audio_chunks,
    )

    with pytest.raises(Exception, match="NotImplementedError|not in container"):
        decode_audio_chunks(media, strict=True).collect()
