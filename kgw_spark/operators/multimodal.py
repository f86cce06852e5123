"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning) is
real and tested; the actual codec work is stubbed behind
``_decode_stub`` because no image/audio libraries exist in this
container — swap the stub for PIL/ffmpeg calls in production. Batches
flow through ``mapInPandas`` so decode cost amortizes per Arrow batch,
and wide binary payloads never pass through a Python row object.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.StringType(), True),  # JSON metadata
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _decode_stub(payload: bytes, kind: str, dim: int) -> list[float]:
    """Deterministic fake decode: derive a feature vector from the
    payload digest. Replace with a real decoder (PIL / torchaudio /
    pyav) in production — the call site, batch shape, and schema stay
    identical."""
    digest = hashlib.sha256(payload).digest()
    raw = (digest * ((dim * 2) // len(digest) + 1))[: dim * 2]
    return [
        int.from_bytes(raw[2 * i : 2 * i + 2], "big") / 65535.0
        for i in range(dim)
    ]


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """media table → per-item feature vectors, batched per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), k, dim)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing — stubbed codec."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; production "
        "implementation is a mapInPandas stage identical in shape to "
        "extract_features with PIL.Image.resize in the batch loop"
    )


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Video frame-sampling plumbing — stubbed codec."""
    raise NotImplementedError(
        "video codecs unavailable in this environment; production "
        "implementation is a mapInPandas stage emitting one row per "
        "sampled frame (posexplode of the decoded frame list)"
    )
