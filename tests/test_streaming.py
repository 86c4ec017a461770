"""Structured Streaming tier ingestion: the streamed 1m tier store must
EQUAL a cold batch recomputation from the same raw rows, micro-batching
and replay notwithstanding (continuous-aggregate correctness extended
to the streaming runtime)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from roll_spark.plans import tiers as T
from roll_spark.sources.transcripts import derive_series, generate_transcripts
from roll_spark.streaming.rollup import TierStore, cascade_from_store, run_stream_to_tier

SCHEMA = "conv_id string, turn_idx int, ts timestamp, text_len double"
KEYS = ["conv_id", "bucket_ts"]


def _stats_pdf(df) -> pd.DataFrame:
    out = (
        df.select("conv_id", "bucket_ts", "n", "sum_x", "m2", "min_x", "max_x",
                  "first_ts", "last_ts")
        .toPandas()
        .sort_values(KEYS)
        .reset_index(drop=True)
    )
    return out


def _assert_tier_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert len(got) == len(want)
    for c in ("conv_id", "bucket_ts", "n", "first_ts", "last_ts"):
        assert got[c].tolist() == want[c].tolist(), c
    for c in ("sum_x", "m2", "min_x", "max_x"):
        assert np.allclose(got[c], want[c], rtol=1e-9, atol=1e-9), c


@pytest.fixture(scope="module")
def raw_dir(spark, tmp_path_factory):
    """Raw transcript series written as MANY small parquet files so
    maxFilesPerTrigger=2 yields several micro-batches."""
    base = tmp_path_factory.mktemp("stream_src")
    df = derive_series(generate_transcripts(spark, n_convs=12, median_turns=30))
    df.select("conv_id", "turn_idx", "ts", "text_len").repartition(8).write.mode(
        "overwrite"
    ).parquet(str(base / "raw"))
    return str(base / "raw")


def test_stream_tier_equals_batch(spark, raw_dir, tmp_path):
    store_path = str(tmp_path / "tier_1m")
    run_stream_to_tier(
        spark, raw_dir, SCHEMA, "text_len", "ts", "conv_id",
        tier="1m", store_path=store_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        # the raw files are written in random (repartitioned) order, so the
        # watermark must cover the source's full time disorder or older
        # events in later micro-batches are dropped as late data — the
        # watermark is a correctness contract, not just a state bound
        watermark="3650 days", max_files_per_trigger=2,
    )
    got = _stats_pdf(spark.read.parquet(store_path))
    raw = spark.read.parquet(raw_dir)
    want = _stats_pdf(T.rollup_raw(raw, "text_len", "ts", "conv_id", "1m"))
    _assert_tier_equal(got, want)

    # coarser tiers derived from the streamed store == batch cascade
    got_1h = _stats_pdf(cascade_from_store(spark, store_path, "conv_id", ("1h",))["1h"])
    want_1h = _stats_pdf(T.cascade(raw, "text_len", "ts", "conv_id", ("1m", "1h"))["1h"])
    _assert_tier_equal(got_1h, want_1h)


def test_store_upsert_idempotent(spark, raw_dir, tmp_path):
    """Replaying the same cumulative update must be a no-op — the
    recovery property foreachBatch's at-least-once semantics rely on."""
    store_path = str(tmp_path / "tier_store")
    raw = spark.read.parquet(raw_dir)
    stats = T.rollup_raw(raw, "text_len", "ts", "conv_id", "1m")
    store = TierStore(spark, store_path, "conv_id", "1m")
    store.upsert(stats)
    once = _stats_pdf(spark.read.parquet(store_path))
    store.upsert(stats)  # replay
    twice = _stats_pdf(spark.read.parquet(store_path))
    _assert_tier_equal(twice, once)
