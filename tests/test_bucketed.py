"""Bucketed storage layout: the shuffle disappears from the PLAN.

These tests assert physical-plan shape, not just results — the whole
point of bucketing at 10^12 turns is that per-series stages stop
exchanging data."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from roll_spark import roll_mean
from roll_spark.sources.bucketed import read_bucketed, write_bucketed


def _counts(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (
        len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan)),
        len(re.findall(r"\bSort \[", plan)),
    )


@pytest.fixture(scope="module")
def bucketed_events(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("user_id", "ts", "value")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_t")
    write_bucketed(ev, "ev_bucketed_t", "user_id", 8,
                   sort_cols=["user_id", "ts"], path=str(base / "ev"))
    yield read_bucketed(spark, "ev_bucketed_t"), ev
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_t")


def test_window_over_bucketed_has_zero_exchanges(spark, bucketed_events):
    """The rolling operator's hash exchange vanishes when the scan is
    bucketed on the series key — and results equal the plain-parquet
    run exactly."""
    t, ev = bucketed_events
    r_b = roll_mean(t, "value", by="user_id", order="ts", width=10,
                    min_obs=5, out="m")
    r_p = roll_mean(ev, "value", by="user_id", order="ts", width=10,
                    min_obs=5, out="m")
    ex_b, _ = _counts(r_b)
    ex_p, _ = _counts(r_p)
    assert ex_b == 0 and ex_p == 1
    a = {(r.user_id, r.ts): r.m for r in r_b.collect()}
    b = {(r.user_id, r.ts): r.m for r in r_p.collect()}
    assert a == b


def test_colocated_self_join_has_zero_exchanges(spark, bucketed_events):
    """Two scans bucketed on the join key sort-merge with no exchange
    on either side (broadcast disabled so the join strategy itself is
    exercised)."""
    t, _ = bucketed_events
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = t.groupBy("user_id").agg(F.avg("value").alias("u_mean"))
        j = t.join(agg, "user_id")
        ex, _ = _counts(j)
        # the per-user aggregate AND the join reuse the bucketed
        # partitioning: no exchange anywhere in the plan
        assert ex == 0
        assert j.count() == t.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
