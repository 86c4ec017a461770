"""Cluster entry point for the retention rollup — the north_rule's
``spark-submit --py-files`` deployment shape.

Usage (cluster):

    zip -r roll_spark.zip roll_spark
    spark-submit --py-files roll_spark.zip tools/submit_rollup.py \
        --input  <iceberg-table-or-parquet-path> \
        --output <warehouse-root> \
        --checkpoint <checkpoint-root> \
        --value text_len --ts ts --series conv_id \
        --tiers 1m,1h,1d --gapfill locf

Local smoke (what the tests drive):

    python tools/submit_rollup.py --input /root/testdata/sf0.001/events.parquet \
        --output /tmp/rollup_out --checkpoint /tmp/rollup_ckpt \
        --value value --ts ts --series user_id

Every tier is a CheckpointedPipeline stage: kill the job at any point
and re-submit with identical args — completed stages are served from
their lineage-manifested parquet, incomplete ones re-run idempotently.
On a real cluster the session builder's local[...] master is simply not
set (spark-submit supplies the master); nothing else changes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description="roll_spark retention rollup job")
    ap.add_argument("--input", required=True, help="parquet path or iceberg table")
    ap.add_argument("--output", required=True, help="output warehouse root")
    ap.add_argument("--checkpoint", required=True, help="checkpoint/lineage root")
    ap.add_argument("--value", required=True, help="numeric series column")
    ap.add_argument("--ts", required=True, help="event-time column")
    ap.add_argument("--series", required=True, help="series key column (conv_id)")
    ap.add_argument("--tiers", default="1m,1h,1d")
    ap.add_argument("--gapfill", choices=["none", "locf", "linear"], default="none")
    ap.add_argument("--cpus", type=int, default=None, help="local-mode cores")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from roll_spark.plans import tiers as T
    from roll_spark.plans.checkpoint import CheckpointedPipeline

    if args.cpus:
        from roll_spark.session import get_spark

        spark = get_spark(cpus=args.cpus, app_name="roll_spark_rollup")
    else:  # under spark-submit the master/conf come from the submit command
        spark = SparkSession.builder.appName("roll_spark_rollup").getOrCreate()

    if args.input.endswith((".parquet", "/")) or Path(args.input).exists():
        raw = spark.read.parquet(args.input)
    else:
        raw = spark.read.table(args.input)

    pipe = CheckpointedPipeline(spark, args.checkpoint)
    tiers = tuple(t.strip() for t in args.tiers.split(",") if t.strip())
    common = {"value": args.value, "ts": args.ts, "series": args.series,
              "input": args.input}

    prev = None
    for tier in tiers:
        if prev is None:
            builder = (lambda df=raw, t=tier: T.rollup_raw(
                df, args.value, args.ts, args.series, t))
        else:
            builder = (lambda df=prev, t=tier: T.merge_tier(df, args.series, t))
        prev = pipe.stage(f"tier_{tier}", builder, params={**common, "tier": tier})
        out = T.finalize(prev)
        if args.gapfill != "none":
            out = T.gapfill(out, args.series, tier, method=args.gapfill)
        # range-partitioned write: files partitioned by event-time day
        # (partition pruning for time-range reads at any store size) and
        # range-clustered by (series, bucket) inside each day so a
        # single series' buckets are contiguous — the same layout
        # TierStore maintains incrementally
        from pyspark.sql import functions as F

        day = F.date_format("bucket_ts", "yyyy-MM-dd").alias("_day")
        (out.withColumn("_day", day)
            .repartitionByRange(args.series, "bucket_ts")
            .write.partitionBy("_day").mode("overwrite")
            .parquet(f"{args.output.rstrip('/')}/tier={tier}"))
        print(f"tier {tier}: {out.count()} rows -> {args.output}/tier={tier}",
              flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
