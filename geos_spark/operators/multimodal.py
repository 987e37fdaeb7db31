"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns with typed metadata, processed via
``mapInPandas`` so batches stream through Arrow without materializing
the whole partition. The actual media decoding is STUBBED (the
image/audio libraries are not in this container): ``decode_image``
raises ``NotImplementedError`` unless ``deterministic_fake=True``, in
which case it derives a small deterministic feature vector from the
bytes — making the Spark-side plumbing (schemas, batch shapes,
partition behavior) real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def decode_image(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array.

    STUB: real decoding needs an image library not present in this
    container. The deterministic fake derives an 8x8x3 uint8 array
    from sha256(payload) so downstream plumbing is exercised with
    stable values.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires an imaging library; "
            "pass deterministic_fake=True for the test fake"
        )
    h = hashlib.sha256(payload or b"").digest()
    rs = np.frombuffer((h * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return rs.reshape(8, 8, 3).copy()


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Streamed feature extraction over binary payloads.

    mapInPandas keeps memory bounded by the Arrow batch size
    regardless of partition size (the 100 TB-safe shape for media
    columns)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            nbytes = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                img = decode_image(raw, deterministic_fake=deterministic_fake)
                # channel-mean + coarse histogram as the fake feature
                v = np.concatenate(
                    [
                        img.mean(axis=(0, 1)) / 255.0,
                        np.histogram(img, bins=dim - 3, range=(0, 255))[0]
                        / img.size,
                    ]
                ).astype(np.float32)
                feats.append(v.tolist())
                nbytes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "feature": feats,
                    "n_bytes": nbytes,
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(n_frames: int, every_n: int) -> list[int]:
    """Deterministic frame-sampling indices for video payloads
    (plumbing helper; decode itself is stubbed as above)."""
    return list(range(0, n_frames, max(1, every_n)))
