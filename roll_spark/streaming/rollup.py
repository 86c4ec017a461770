"""Structured Streaming ingestion for the retention-tier cascade.

The reference package has no streaming runtime ("online" in roll means
the O(1)-per-row algorithm, not a stream — SURVEY.md §2.3); this module
is the engine's extension for continuously-arriving transcripts. The
design reuses the batch tier algebra unchanged:

- the stream aggregates to the SAME mergeable sufficient statistics
  as ``roll_spark.plans.tiers.rollup_raw`` (n, sum_x, m2, min, max,
  first/last), keyed by (series, event-time window), inside Structured
  Streaming's state store with a watermark bounding per-key state;
- update-mode emits carry the CUMULATIVE aggregate for every window a
  micro-batch touched, so foreachBatch upserts them into a persistent
  tier store (replace by (series, bucket) key — NOT a merge, which
  would double-count). Once the source is drained the store EQUALS a
  cold batch recomputation from raw (asserted in
  tests/test_streaming.py);
- coarser tiers (1h/1d) are derived from the stored 1m tier with the
  existing batch Chan-merge cascade.

Scale notes: the upsert is idempotent under micro-batch replay
(at-least-once foreachBatch semantics converge), the same property the
batch checkpoint layer provides (roll_spark.plans.checkpoint). On an
object store the tmp-swap below becomes an Iceberg MERGE INTO keyed on
(series, bucket_ts).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from roll_spark.operators.base import Cols, _as_list
from roll_spark.plans import tiers as T

_WINDOW_DURATION = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def stream_rollup_raw(
    sdf: DataFrame,
    value: str,
    ts: str,
    by: Cols,
    tier: str,
    *,
    watermark: str = "10 minutes",
    bucket_out: str = "bucket_ts",
) -> DataFrame:
    """Streaming raw -> tier sufficient stats (same columns as
    ``tiers.rollup_raw``).

    Uses ``F.window`` on the watermarked event-time column — the form
    Structured Streaming tracks for state eviction — rather than
    ``date_trunc``; ``window.start`` is identical to the batch
    ``date_trunc`` bucket for aligned durations.
    """
    v = F.col(value)
    n = F.count(v)
    first_struct = F.min(F.when(v.isNotNull(), F.struct(F.col(ts).alias("t"), v.alias("v"))))
    last_struct = F.max(F.when(v.isNotNull(), F.struct(F.col(ts).alias("t"), v.alias("v"))))
    return (
        sdf.withWatermark(ts, watermark)
        .groupBy(*_as_list(by), F.window(F.col(ts), _WINDOW_DURATION[tier]).alias("_w"))
        .agg(
            n.alias("n"),
            n.cast("double").alias("sum_w"),
            F.sum(v).alias("sum_x"),
            F.coalesce(F.var_samp(v) * (n - 1), F.lit(0.0)).alias("m2"),
            F.min(v).alias("min_x"),
            F.max(v).alias("max_x"),
            first_struct.getField("t").alias("first_ts"),
            first_struct.getField("v").alias("first_x"),
            last_struct.getField("t").alias("last_ts"),
            last_struct.getField("v").alias("last_x"),
        )
        .withColumn(bucket_out, F.col("_w.start"))
        .drop("_w")
    )


class TierStore:
    """Parquet-backed store of one tier's sufficient statistics with an
    exact idempotent merge. Local-FS tmp-swap keeps read/overwrite of
    the same path safe; production form is an Iceberg MERGE INTO."""

    def __init__(self, spark: SparkSession, path: str, by: Cols, tier: str):
        self.spark = spark
        self.path = path
        self.by = _as_list(by)
        self.tier = tier

    def read(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def upsert(self, updated: DataFrame) -> None:
        """Replace the store's rows for every (series, bucket) key present
        in ``updated`` — update-mode rows are cumulative aggregates, so
        replacement (not moment-merging) is the exact operation, and
        replaying a micro-batch is a no-op (idempotent recovery)."""
        cur = self.read()
        cols = [*self.by, "bucket_ts", *T.STAT_COLS]
        new = updated.select(*cols)
        if cur is not None:
            keys = [*self.by, "bucket_ts"]
            kept = cur.select(*cols).join(
                new.select(*keys), on=keys, how="left_anti"
            )
            new = kept.unionByName(new)
        tmp = self.path + "__tmp"
        new.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.replace(tmp, self.path)


def run_stream_to_tier(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    value: str,
    ts: str,
    by: Cols,
    *,
    tier: str = "1m",
    store_path: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """Consume a parquet directory as a stream and fold it into a tier
    store, micro-batch by micro-batch (availableNow: drains everything
    currently in the source, in bounded batches, then stops).

    Emits in update mode via foreachBatch so windows still above the
    watermark are upserted too — the store converges to the exact batch
    answer once the source is drained.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.parquet(source_dir)
    stats = stream_rollup_raw(sdf, value, ts, by, tier, watermark=watermark)
    store = TierStore(spark, store_path, by, tier)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        store.upsert(batch_df)

    (
        stats.writeStream.outputMode("update")
        .foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def cascade_from_store(
    spark: SparkSession,
    store_path: str,
    by: Cols,
    tiers: tuple[str, ...] = ("1h", "1d"),
) -> dict[str, DataFrame]:
    """Derive coarser tiers from a streamed finest-tier store with the
    batch Chan-merge cascade."""
    cur = spark.read.parquet(store_path)
    out: dict[str, DataFrame] = {}
    for tier in tiers:
        cur = T.merge_tier(cur, by, tier)
        out[tier] = cur
    return out
