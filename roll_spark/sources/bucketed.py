"""Bucketed table layout — the co-located-join / shuffle-free-window
storage story.

Writing the transcripts/events store hash-bucketed by the series key
(and sorted by (series, order) inside each bucket) makes the scan's
output partitioning satisfy downstream requirements directly:

- every rolling operator's Window (partitioned by the series key)
  plans with ZERO exchanges — the per-round shuffle that dominates
  10^12-turn rollups disappears from the plan entirely (asserted in
  tests/test_bucketed.py);
- joins between two tables bucketed on the same key with the same
  bucket count (events ⋈ sessions, raw ⋈ tier) sort-merge with ZERO
  exchanges on either side;
- the in-bucket sort order feeds the Window's required ordering, so
  at most a partial per-bucket sort remains.

At cluster scale pick n_buckets ≈ a small multiple of total executor
cores (buckets are the parallelism floor AND the open-files-per-writer
count); bucket pruning applies on equality predicates over the bucket
key. This composes with the tier cascade: bucket the raw store once,
and every per-series stage downstream is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from roll_spark.operators.base import Cols, _as_list


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Cols,
    n_buckets: int,
    *,
    sort_cols: Cols | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save ``df`` as a bucketed (optionally in-bucket-sorted) table.

    ``path`` makes it an external table (data at ``path``, metadata in
    the session catalog) — bucketing metadata lives in the catalog, so
    reads must go through :func:`read_bucketed` / ``spark.table``, not
    ``spark.read.parquet`` (a bare parquet read loses the bucketing
    and re-shuffles downstream).
    """
    w = df.write.format(fmt).mode(mode).bucketBy(int(n_buckets), *_as_list(keys))
    if sort_cols is not None:
        w = w.sortBy(*_as_list(sort_cols))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucketed output partitioning."""
    return spark.table(table)
