"""Gorilla codec: bit-exact round-trips (unit) and through the Spark
chunk store (compress per (conv, day) -> decompress -> original rows)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from roll_spark.compression import (
    decode_chunk,
    decode_chunk_auto,
    decode_chunk_v2,
    encode_chunk,
    encode_chunk_v2,
)
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


def _cases():
    """Shared adversarial fixtures; the scalar codec is the oracle."""
    rng = np.random.default_rng(11)
    n = 5000
    ts = np.cumsum(rng.integers(1, 10**7, n)).astype(np.int64)
    vals = rng.normal(size=n) * 1e3
    vals[rng.random(n) < 0.1] = np.nan
    cases = [(ts, vals)]
    # regular cadence + constant values (all-zero DoD / all-zero XOR)
    n2 = 4096
    cases.append(
        (
            (np.arange(n2, dtype=np.int64) * 60_000_000) + 1_700_000_000_000_000,
            np.full(n2, 42.5),
        )
    )
    # wild timestamps forcing every DoD bucket incl. 64-bit raw
    cases.append(
        (
            np.array([0, 1, 2, 70, 100, 3000, 10**15, 10**15 + 1], "int64"),
            np.array([1.0, 1.0, -0.0, 0.0, np.inf, -np.inf, np.nan, 2.0**-1074]),
        )
    )
    # singletons / empties / all-NaN
    cases.append((np.array([], "int64"), np.array([], "float64")))
    cases.append((np.array([7], "int64"), np.array([np.nan])))
    cases.append((np.array([1, 2, 3], "int64"), np.full(3, np.nan)))
    # >1 block of nonzero XORs with mixed magnitudes (window variety)
    n3 = 1500
    v3 = np.where(rng.random(n3) < 0.5, rng.normal(size=n3), rng.normal(size=n3) * 1e-300)
    cases.append((np.cumsum(rng.integers(1, 100, n3)).astype(np.int64), v3))
    return cases


def test_v2_matches_scalar_oracle():
    """RSG2 (vectorized) round-trips bit-exactly and agrees with the
    scalar RSG1 oracle on every adversarial fixture."""
    for ts, vals in _cases():
        t1, v1 = decode_chunk(encode_chunk(ts, vals))
        blob2 = encode_chunk_v2(ts, vals)
        t2, v2 = decode_chunk_v2(blob2)
        assert np.array_equal(ts, t1) and np.array_equal(ts, t2)
        bits = vals.view(np.uint64) if len(vals) else np.array([], np.uint64)
        assert np.array_equal(bits, v1.view(np.uint64))
        assert np.array_equal(bits, v2.view(np.uint64))
        # auto-dispatch reads both formats
        ta, va = decode_chunk_auto(blob2)
        assert np.array_equal(ts, ta)
        tb, _ = decode_chunk_auto(encode_chunk(ts, vals))
        assert np.array_equal(ts, tb)


def test_v2_compression_ratio():
    # constant series at fixed cadence stays tiny under the columnar
    # layout too (~block headers only)
    n = 4096
    ts = (np.arange(n, dtype=np.int64) * 60_000_000) + 1_700_000_000_000_000
    blob = encode_chunk_v2(ts, np.full(n, 42.5))
    assert len(blob) < n / 2, len(blob)
    # noisy doubles at random cadence: the block-window columnar layout
    # stays within ~15% of the scalar codec's adaptive per-value windows
    rng = np.random.default_rng(3)
    vals = rng.normal(size=n)
    ts2 = np.cumsum(rng.integers(1, 10**6, n)).astype(np.int64)
    assert len(encode_chunk_v2(ts2, vals)) < 1.15 * len(encode_chunk(ts2, vals))


def test_v2_rejects_bad_magic():
    with pytest.raises(ValueError):
        decode_chunk_auto(b"XXXX\x00\x00\x00\x00")


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


def test_compress_policy_tiered_read(spark):
    """compress_chunks analog: rows before the cutoff become chunk
    blobs, rows at/after stay raw (never encoded), and tiered_read's
    seam union restores the original relation exactly — each row on
    exactly one side."""
    from roll_spark.plans.chunks import compress_policy, tiered_read

    df = derive_series(generate_transcripts(spark, n_convs=5, median_turns=60))
    src = df.select("conv_id", "ts", F.col("text_len").alias("v"))
    cutoff = src.selectExpr("CAST(percentile(unix_micros(ts), 0.5) AS LONG)") \
                .collect()[0][0]
    before = str(
        src.selectExpr(f"timestamp_micros({cutoff})").collect()[0][0])
    chunks, hot = compress_policy(src, "v", "ts", "conv_id", before=before)
    n_cold = chunks.agg(F.sum("n")).collect()[0][0] or 0
    n_hot = hot.count()
    assert n_cold > 0 and n_hot > 0, "cutoff must split the fixture"
    assert n_cold + n_hot == src.count()  # exactly one side each
    # hot rows are raw (no blob column) and all at/after the cutoff
    assert "blob" not in hot.columns
    assert hot.filter(F.col("ts") < F.lit(before).cast("timestamp")).count() == 0
    # seam union == original, bit for bit (keys, µs timestamps, doubles)
    got = tiered_read(chunks, hot, "v", "ts", "conv_id")
    a = {
        (r[0], r[1]): r[2]
        for r in src.withColumn("ts", F.col("ts").cast("timestamp_ntz")).collect()
    }
    b = {(r[0], r[1]): r[2] for r in got.collect()}
    assert a == b
