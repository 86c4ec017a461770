"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas.

The decode step is STUBBED (the sandbox image has no image/audio
libraries): ``decoder="fake"`` produces a deterministic feature vector
from the bytes so the Spark-side plumbing — schema, batching,
partitioning, UDF signature — is real and tested; ``decoder="real"``
raises NotImplementedError where PIL/librosa would slot in.

Layout contract: media rows are (media_id long, kind string, meta
struct<width int, height int, sample_rate int>, payload binary).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, "
    "meta struct<width:int, height:int, sample_rate:int>, payload binary"
)

FEATURE_DIM = 8


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 5640) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[np.arange(n) % 3]
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8)
        meta = {
            "width": int(rng.integers(16, 1024)) if kinds[i] != "audio" else None,
            "height": int(rng.integers(16, 1024)) if kinds[i] != "audio" else None,
            "sample_rate": 16000 if kinds[i] == "audio" else None,
        }
        rows.append((i, str(kinds[i]), meta, bytes(payload.tobytes())))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: moments of the
    byte stream. Replaces PIL.Image.open / soundfile.read in this image."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM)
    return np.array(
        [
            arr.size,
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            np.median(arr),
            float(np.count_nonzero(arr == 0)),
            arr[: min(16, arr.size)].sum(),
        ]
    )


def extract_features(
    media: DataFrame, *, decoder: str = "fake", batch_hint: int = 1024
) -> DataFrame:
    """media rows -> (media_id, kind, features array<double>).

    mapInPandas: one Arrow batch of payloads in, one batch of feature
    vectors out; executors never hold more than a batch of payloads.
    Partition by storage locality upstream (the payload column never
    shuffles — extraction is a map-only stage).
    """
    if decoder == "real":
        raise NotImplementedError(
            "real decoders (PIL / soundfile / av) are not installed in this "
            "image; wire them here behind the same iterator contract"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        fn, schema="media_id long, kind string, features array<double>"
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands each video row into frame
    descriptors (frame_idx, byte offsets) without decoding — the shape
    a real frame sampler fans out over. Decode itself is the stub above."""
    vids = media.filter(F.col("kind") == "video")
    n_frames = F.greatest((F.length("payload") / 64).cast("int"), F.lit(1))
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * 64)
