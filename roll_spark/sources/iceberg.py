"""Iceberg table source for the transcripts input (north_rule: the
engine reads Iceberg tables of conversation transcripts).

This sandbox has no Iceberg runtime jar, so the adapter resolves a
uniform table reference either to an Iceberg catalog table (cluster,
jar present) or to a parquet path (local fallback) behind one call —
every engine stage takes a DataFrame, so nothing downstream changes.

Cluster wiring (spark-submit):

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.roll=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.roll.type=hadoop \
      --conf spark.sql.catalog.roll.warehouse=s3://bucket/warehouse \
      ...

Partitioning guidance for the 10^12-turn transcripts table (applies to
the CREATE TABLE, not this reader): partition by days(ts) + bucket(N,
conv_id) so (a) tier rollups prune to the day partitions they touch and
(b) per-conversation window work co-locates without hot partitions;
sort order (conv_id, turn_idx) within files makes the window sort a
near-noop and keeps Iceberg's min/max file stats selective on both
keys. The scan then reaches Catalyst with pushed filters + pruned
columns (only conv_id/turn_idx/ts + the derived-series inputs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def iceberg_session_conf(
    catalog: str = "roll", warehouse: str = "warehouse"
) -> dict[str, str]:
    """The session conf a cluster deployment adds (jar via --packages)."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def has_iceberg(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Resolve a table reference to a DataFrame.

    - ``iceberg:cat.db.tbl``  -> ``spark.read.table`` (requires the jar;
      raises a clear error when absent);
    - ``*.parquet`` or an existing path -> parquet read;
    - anything else -> catalog table name.
    """
    if ref.startswith(ICEBERG_PREFIX):
        name = ref[len(ICEBERG_PREFIX):]
        if not has_iceberg(spark):
            raise RuntimeError(
                f"Iceberg runtime not on the classpath; cannot read {name!r}. "
                "Submit with --packages org.apache.iceberg:iceberg-spark-runtime-*"
            )
        return spark.read.table(name)
    if ref.endswith(".parquet") or ref.endswith("/"):
        return spark.read.parquet(ref)
    import os

    if os.path.exists(ref):
        return spark.read.parquet(ref)
    return spark.read.table(ref)


def write_tier(
    df: DataFrame,
    ref: str,
    *,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
) -> None:
    """Range-partitioned, within-partition-sorted tier write.

    Iceberg target -> ``writeTo(...).createOrReplace()`` (the table's
    declared partition spec applies); parquet fallback -> partitionBy
    directories. ``sort_within`` pre-sorts rows inside each output file
    so downstream window scans avoid a sort and min/max stats stay
    selective — the north_rule's "range-partitioned writes sorted
    within partitions".
    """
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    if ref.startswith(ICEBERG_PREFIX):
        df.writeTo(ref[len(ICEBERG_PREFIX):]).createOrReplace()
        return
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)
