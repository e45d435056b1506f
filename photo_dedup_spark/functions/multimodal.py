"""Multimodal (image/audio/video) column plumbing over mapInPandas.

The reference decodes real images (PIL) for pixel hashing and dHash
(/root/reference/photo_dedup/hasher.py:95-224).  In this engine,
media payloads are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing — schema, Arrow batch shape, partitioning, UDF
signatures — is real and tested, while the codec step itself is
STUBBED: the container has no image/audio libraries, so ``decode_*``
raise ``NotImplementedError`` unless ``fake=True`` selects the
deterministic fake decoder (seeded from the payload bytes), which is
what tests and the synthetic corpus use.

Operators:
  * decode_image_features — decode → (width, height, channels) +
    a 64-dim float feature vector (the dHash analog for media)
  * resize_meta — recompute metadata for a target size (pure plumbing)
  * frame_sample — video: pick every k-th frame index (pure plumbing)

All are ``mapInPandas`` iterators over Arrow batches — the pattern that
keeps peak memory at batch size, not partition size, which is the
constraint that matters when payloads are MBs each at 100 TB scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_DIM = 64

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decoder: dimensions and features derived from
    a sha256 of the payload — stable across runs/partitions."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    channels = 3
    seed = int.from_bytes(h[2:6], "big")
    rng = np.random.RandomState(seed)
    feats = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    return width, height, channels, feats


def decode_image_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """media (id, payload binary) -> IMAGE_FEATURES_SCHEMA rows.

    Per-row decode failures produce a row with NULL features and a
    ``decode_error`` string — the reference's count-and-drop contract
    (scanner.py:471-479) with the error carried as data instead of a
    side channel.
    """

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "channels": [],
                "features": [],
                "decode_error": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                out["media_id"].append(mid)
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    if not fake:
                        raise NotImplementedError(
                            "real image codecs unavailable in this container; "
                            "pass fake=True for the deterministic stub"
                        )
                    w, h, c, feats = _fake_decode(bytes(payload))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(c)
                    out["features"].append(feats.tolist())
                    out["decode_error"].append(None)
                except (NotImplementedError, ValueError, TypeError) as e:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["features"].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    cols = media.select(id_col, payload_col)
    return cols.mapInPandas(_map, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
    ]
)


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp.

    Pure plumbing (no codec needed): the schedule a real decoder would
    consume.  Implemented with ``sequence`` + ``posexplode`` — JVM-side,
    no Python."""
    from pyspark.sql import functions as F

    n = (F.col(duration_col) / every_ms).cast("int")
    return (
        media.select(id_col, duration_col)
        .where(F.col(duration_col) > 0)
        .select(
            id_col,
            F.posexplode(F.sequence(F.lit(0), n)).alias("frame_index", "_step"),
        )
        .select(
            id_col,
            "frame_index",
            (F.col("frame_index") * every_ms).cast("long").alias("frame_ts_ms"),
        )
    )
