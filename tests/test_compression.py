"""Gorilla codec: bit-exact round-trips (unit) and through the Spark
chunk store (compress per (conv, day) -> decompress -> original rows)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from roll_spark.compression import decode_chunk, encode_chunk
from roll_spark.plans.chunks import compress_series, decompress_series
from roll_spark.sources.transcripts import derive_series, generate_transcripts


def test_roundtrip_random():
    rng = np.random.default_rng(11)
    n = 2000
    ts = np.cumsum(rng.integers(1, 10**7, n)).astype(np.int64)
    vals = rng.normal(size=n) * 1e3
    vals[rng.random(n) < 0.1] = np.nan
    t2, v2 = decode_chunk(encode_chunk(ts, vals))
    assert np.array_equal(ts, t2)
    assert np.array_equal(vals.view(np.uint64), v2.view(np.uint64))


def test_roundtrip_regular_cadence_compresses():
    n = 4096
    ts = (np.arange(n, dtype=np.int64) * 60_000_000) + 1_700_000_000_000_000
    vals = np.full(n, 42.5)
    blob = encode_chunk(ts, vals)
    t2, v2 = decode_chunk(blob)
    assert np.array_equal(ts, t2) and np.array_equal(vals, v2)
    # constant series at fixed cadence: ~2 bits/point after the header
    assert len(blob) < n / 2, len(blob)


def test_edge_cases():
    for ts_e, v_e in [
        ([], []),
        ([0], [0.0]),
        ([-5, 10**17], [np.inf, -np.inf]),
        ([1, 2, 3], [np.nan, np.nan, np.nan]),
    ]:
        t, v = decode_chunk(encode_chunk(np.array(ts_e, "int64"), np.array(v_e)))
        assert list(t) == ts_e
        assert np.array_equal(
            np.array(v_e).view(np.uint64) if len(v_e) else np.array([]),
            v.view(np.uint64) if len(v_e) else np.array([]),
        )


def test_spark_chunk_store_roundtrip(spark):
    df = derive_series(generate_transcripts(spark, n_convs=5, median_turns=50))
    src = df.select("conv_id", "ts", F.col("text_len").alias("v"))
    chunks = compress_series(src, "v", "ts", "conv_id")
    n_chunks = chunks.count()
    assert n_chunks > 0
    assert chunks.agg(F.sum("n")).collect()[0][0] == src.count()
    restored = decompress_series(chunks, "conv_id")
    a = {
        (r[0], r[1]): r[2]
        for r in src.withColumn("ts", F.col("ts").cast("timestamp_ntz")).collect()
    }
    b = {(r[0], r[1]): r[2] for r in restored.collect()}
    assert a == b
