"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake or NotImplementedError) — but the Spark-side plumbing
is real and tested: schemas, batch iteration, partition sizing, UDF
signatures. Swapping the stub for PIL/ffmpeg is a one-function change.

Scale notes:
  - binary payloads dominate partition size → repartition by row count
    (maxRecordsPerBatch) before mapInPandas, not by bytes heuristics
  - metadata (width/height/duration) lives in plain columns so filters
    like `width >= 512` prune *before* any decode
  - outputs are columnar (features array<float>) so downstream similarity
    ops reuse the operators.similarity path
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image | audio | video
    T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),       # images/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),    # audio/video
])

FEATURE_DIM = 16


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real implementation would be PIL.Image.open(BytesIO(payload)).

    The deterministic fake derives a pseudo-pixel array from the payload
    bytes so downstream plumbing (shapes, dtypes, feature extraction) is
    exercised honestly."""
    if payload is None:
        raise ValueError("null payload")
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32)


def extract_features(pixels: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB feature extractor (mean-pooled blocks). A real model (CLIP,
    whisper, ...) slots in here; the Spark-side contract is unchanged:
    ndarray in, fixed-dim float32 out."""
    flat = pixels.astype(np.float64).ravel()
    blocks = np.array_split(flat, dim)
    return np.array([b.mean() for b in blocks], dtype=np.float32)


def featurize(df: DataFrame, batch_size: int = 256,
              decode: Callable[[bytes], np.ndarray] = decode_image,
              extract: Callable[[np.ndarray], np.ndarray] = extract_features) -> DataFrame:
    """media table → (media_id, features array<float>, feat_norm double).

    mapInPandas (Arrow-batched): each batch decodes + extracts vectorized;
    payload bytes never round-trip through Python row objects."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
        T.StructField("feat_norm", T.DoubleType(), False),
    ])

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                vec = extract(decode(payload))
                feats.append(vec)
            fm = np.stack(feats) if feats else np.zeros((0, FEATURE_DIM), np.float32)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "features": [f.tolist() for f in fm],
                "feat_norm": np.linalg.norm(fm.astype(np.float64), axis=1) if len(fm) else [],
            })

    # select only what the UDF needs — column pruning cuts the Arrow
    # transfer to id+payload even though the table carries metadata
    narrowed = df.select("media_id", "payload")
    return narrowed.mapInPandas(process, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: explode sample timestamps from metadata
    (duration_ms) without decoding — the decode of chosen frames happens
    in a later featurize pass over (media_id, frame_ts) pairs. This keeps
    the explode JVM-side and defers all heavy work."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts"),
        )
    )


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    rng = np.random.default_rng(42)
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, 128, dtype=np.uint8))
        rows.append((
            i, kind, payload,
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            640 if kind != "audio" else None,
            480 if kind != "audio" else None,
            int(rng.integers(1000, 60000)) if kind != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
