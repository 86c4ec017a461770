"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas.

Two decoders share one feature contract (FEATURE_DIM stats):

- ``decoder="fake"``: deterministic features from the raw BYTES —
  plumbing-only stand-in, works for any payload.
- ``decoder="real"``: genuine pure-numpy decoders for public
  uncompressed formats — Netpbm P5/P6 images (the public PGM/PPM
  binary spec, 8- and 16-bit) and RIFF/WAVE audio (PCM 8/16/24/32-bit
  and IEEE float32/64) — features computed over the DECODED samples.
  Compressed formats (JPEG/MP3/video containers) need codec libraries
  this image doesn't ship; under the real decoder those payloads
  yield NULL features rather than failing the batch, and the
  ``video`` kind is always NULL (no pure-numpy container demuxer).

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


# ---------------------------------------------------------------------------
# real decoders: Netpbm P5/P6 (public PGM/PPM spec) and RIFF/WAVE,
# pure numpy — no codec libraries required
# ---------------------------------------------------------------------------


def _pnm_tokens(payload: bytes, count: int) -> tuple[list[int], int]:
    """Read `count` whitespace-separated header ints, honoring '#'
    comments (Netpbm spec); returns (values, offset past the single
    whitespace byte that terminates the header)."""
    vals: list[int] = []
    i = 2  # past magic
    n = len(payload)
    while len(vals) < count:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i] == ord("#"):
            while i < n and payload[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary Netpbm image -> (height, width, channels) uint8/uint16.

    P5 = grayscale (1 channel), P6 = RGB (3 channels); maxval <= 255
    is 1 byte/sample, 256..65535 is 2 bytes/sample big-endian, per the
    public spec (netpbm.sourceforge.net pgm/ppm format pages).
    """
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload: {magic!r}")
    (width, height, maxval), off = _pnm_tokens(payload, 3)
    channels = 1 if magic == b"P5" else 3
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    count = width * height * channels
    raster = np.frombuffer(payload, dtype=dtype, count=count, offset=off)
    return raster.reshape(height, width, channels).astype(
        np.uint16 if maxval > 255 else np.uint8
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of decode_ppm, for fixtures: (h, w, 1|3) uint8/uint16."""
    h, w, c = img.shape
    magic = b"P5" if c == 1 else b"P6"
    maxval = 65535 if img.dtype.itemsize == 2 else 255
    dt = ">u2" if maxval == 65535 else "u1"
    return magic + f"\n{w} {h}\n{maxval}\n".encode() + img.astype(dt).tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> ((n_samples, n_channels) float64 in [-1, 1], rate).

    Walks the chunk list (public WAVE spec): fmt tag 1 = PCM
    (8-bit unsigned, 16/24/32-bit signed), tag 3 = IEEE float32/64.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = np.frombuffer(payload, "<u4", count=1, offset=pos + 4)
        size = int(size)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate = (
                int(np.frombuffer(body, "<u2", 1, 0)[0]),
                int(np.frombuffer(body, "<u2", 1, 2)[0]),
                int(np.frombuffer(body, "<u4", 1, 4)[0]),
            )
            bits = int(np.frombuffer(body, "<u2", 1, 14)[0])
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, ch, rate, bits = fmt
    if tag == 3:  # IEEE float
        x = np.frombuffer(data, "<f4" if bits == 32 else "<f8").astype(np.float64)
    elif tag == 1 and bits == 8:
        x = (np.frombuffer(data, "u1").astype(np.float64) - 128.0) / 128.0
    elif tag == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    elif tag == 1 and bits == 24:
        raw = np.frombuffer(data, "u1").reshape(-1, 3)
        x = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64) / float(1 << 23)
    elif tag == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float64) / float(1 << 31)
    else:
        raise ValueError(f"unsupported WAVE fmt tag={tag} bits={bits}")
    return x.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int, *, bits: int = 16) -> bytes:
    """Inverse of decode_wav for fixtures: float64 [-1,1] -> 16-bit PCM
    or 32-bit IEEE float WAVE."""
    s = np.atleast_2d(np.asarray(samples, np.float64))
    if s.shape[0] < s.shape[1] and samples.ndim == 1:
        s = s.T
    ch = s.shape[1]
    if bits == 16:
        tag, data = 1, np.clip(np.rint(s * 32768.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 32:
        tag, data = 3, s.astype("<f4").tobytes()
    else:
        raise ValueError("fixture encoder supports bits in (16, 32)")
    block = ch * bits // 8
    fmt = (
        np.array([tag, ch], "<u2").tobytes()
        + np.array([rate, rate * block], "<u4").tobytes()
        + np.array([block, bits], "<u2").tobytes()
    )
    chunks = b"fmt " + np.array([len(fmt)], "<u4").tobytes() + fmt
    chunks += b"data" + np.array([len(data)], "<u4").tobytes() + data
    return b"RIFF" + np.array([4 + len(chunks)], "<u4").tobytes() + b"WAVE" + chunks


def _stats_vector(arr: np.ndarray) -> np.ndarray:
    """The shared FEATURE_DIM-stat contract over a 1-D sample array."""
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


def _real_decode(payload: bytes, kind: str) -> np.ndarray | None:
    """Decode + feature-extract over DECODED samples; None when the
    payload isn't one of the supported uncompressed formats."""
    try:
        if kind == "image":
            return _stats_vector(decode_ppm(payload).astype(np.float64).ravel())
        if kind == "audio":
            samples, _rate = decode_wav(payload)
            return _stats_vector(samples.ravel())
        return None  # video: no pure-numpy container demuxer
    except ValueError:
        return None


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
        decode = _real_decode
    elif decoder == "fake":
        decode = _fake_decode
    else:
        raise ValueError(f"unknown decoder: {decoder}")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                v = decode(p, k)
                feats.append(None if v is None else v.tolist())
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
