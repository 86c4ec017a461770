"""Structured Streaming extensions: continuous tier ingestion whose
stored sufficient statistics exactly equal the batch cascade."""

from roll_spark.streaming.rollup import (
    TierStore,
    cascade_from_store,
    run_stream_to_tier,
    stream_rollup_raw,
)

__all__ = ["TierStore", "cascade_from_store", "run_stream_to_tier", "stream_rollup_raw"]
