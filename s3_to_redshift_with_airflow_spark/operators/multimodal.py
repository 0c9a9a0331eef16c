"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (the BASELINE.json mandate — the reference is text/CSV-only): media
is carried as `BinaryType` payload columns with a modality tag and a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over `mapInPandas`, so payload bytes stream through
executors batch-by-batch and never transit the driver.

The actual codec step needs image/audio libraries that are NOT in this
container, so decoding is STUBBED in two clearly-marked ways:
  - `decode_image(..., strict=True)` raises NotImplementedError where a real
    `PIL.Image.open` call belongs;
  - by default a DETERMINISTIC FAKE decode derives features arithmetically
    from the payload bytes (length, first-bytes digest, fake dimensions) so
    the Spark-side plumbing — schema, batching, partitioning, UDF signature —
    is real and testable end-to-end.

Scale notes (100 TB of media):
  - payloads dominate row size → `spark.sql.files.maxPartitionBytes` sizes
    input splits; repartition by a size-bucket column before heavy decode so
    batches are byte-balanced, not row-balanced;
  - features (small) should be written to a separate table keyed by media_id
    so downstream analytics never rescans payload bytes;
  - frame sampling explodes rows — do it AFTER filtering to the wanted clips.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_image_features(payload: bytes | None, dim: int = 8) -> dict:
    """Deterministic fake 'decode': features derived from payload bytes only.

    Stands in for PIL/libvips decode so plumbing is testable without codecs.
    """
    if payload is None:
        return {
            "n_bytes": 0, "digest": None, "fake_width": 0, "fake_height": 0,
            "embedding": [0.0] * dim,
        }
    digest = hashlib.md5(payload).hexdigest()
    emb = [int(digest[2 * i : 2 * i + 2], 16) / 255.0 for i in range(dim)]
    return {
        "n_bytes": len(payload),
        "digest": digest,
        "fake_width": (len(payload) % 64) + 1,
        "fake_height": (len(payload) % 48) + 1,
        "embedding": emb,
    }


def decode_image_features(
    media: DataFrame, strict: bool = False, embedding_dim: int = 8
) -> DataFrame:
    """Decode image payloads → feature rows via mapInPandas (Arrow batches).

    strict=True marks where the real decoder belongs (PIL not in container).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                # Real implementation: PIL.Image.open(io.BytesIO(payload)),
                # resize/convert, then a vision encoder. Library absent here.
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision (not in container)"
                )
            feats = [
                _fake_image_features(p, embedding_dim) for p in pdf["payload"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.filter(F.col("modality") == "image").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sample plan for video payloads: one output row per sampled frame
    offset (frame decode itself is the stubbed step — offsets and schema are
    the real plumbing; explode happens JVM-side, not in Python).

    Returns (media_id, frame_index, offset_ms, payload) — a downstream
    mapInPandas decodes each (payload, offset) pair where codecs exist.
    """
    n_frames = F.least(
        F.floor(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int")
        + 1,
        F.lit(max_frames),
    )
    return (
        media.filter(F.col("modality") == "video")
        .withColumn("frame_index", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select(
            "media_id",
            "frame_index",
            (F.col("frame_index") * every_ms).alias("offset_ms"),
            "payload",
        )
    )


def with_size_buckets(media: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Byte-balanced repartitioning key: heavy decode stages should
    `repartition(n, "size_bucket")` so a few huge payloads don't serialize
    one task while others idle."""
    # pmod: Spark's % is a signed remainder and xxhash64 can be negative.
    return media.withColumn(
        "size_bucket",
        F.pmod(
            F.xxhash64("media_id") + F.coalesce(F.length("payload"), F.lit(0)),
            F.lit(n_buckets),
        ).cast("int"),
    )


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("chunk_index", T.LongType(), False),
        T.StructField("offset_ms", T.LongType(), False),
        T.StructField("chunk_digest", T.StringType(), True),
        T.StructField("energy", T.LongType(), True),
    ]
)


def decode_audio_chunks(
    media: DataFrame,
    chunk_ms: int = 2000,
    max_chunks: int = 12,
    strict: bool = False,
) -> DataFrame:
    """Audio pipeline: fixed-duration chunking + per-chunk feature decode.

    Chunk offsets explode JVM-side from typed duration metadata (payload
    bytes untouched until decode — same posture as sample_video_frames);
    the per-chunk decode runs as Arrow-batched mapInPandas. The real
    implementation is `librosa.load`/`soundfile` + an RMS/fbank computation
    per chunk — library absent in this container, so strict=True raises at
    that spot and the default is a DETERMINISTIC FAKE (md5 of payload+offset,
    integer pseudo-energy) that keeps schema, batching, and chunk math real
    and oracle-verifiable.
    """
    n_chunks = F.least(
        F.floor(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / chunk_ms).cast("int")
        + 1,
        F.lit(max_chunks),
    )
    chunks = (
        media.filter(F.col("modality") == "audio")
        .withColumn("chunk_index", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "media_id",
            F.col("chunk_index").cast("long").alias("chunk_index"),
            (F.col("chunk_index").cast("long") * chunk_ms).alias("offset_ms"),
            "payload",
        )
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                # Real implementation: soundfile/librosa decode of
                # payload[offset window], then RMS / filterbank features.
                raise NotImplementedError(
                    "real audio decode requires librosa/soundfile (not in container)"
                )
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            offsets = pdf["offset_ms"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "chunk_index": pdf["chunk_index"].values,
                    "offset_ms": pdf["offset_ms"].values,
                    "chunk_digest": [
                        hashlib.md5(p + b"|" + str(o).encode()).hexdigest()
                        for p, o in zip(payloads, offsets)
                    ],
                    "energy": [
                        (len(p) + o) % 1000 for p, o in zip(payloads, offsets)
                    ],
                }
            )

    return chunks.mapInPandas(batches, schema=AUDIO_CHUNK_SCHEMA)
