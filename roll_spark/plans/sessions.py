"""Gap-based sessionization of event / conversation-turn streams.

A session breaks when the inter-event gap within a series exceeds
``gap_s``: the classic web-analytics / transcript-segmentation op and a
building block of the training-data pipeline (one LLM conversation =
one series; sessions = interaction bursts).

Spark-first: session assignment is the prefix-sum of session-start
flags —

    is_new  = prev_ts IS NULL OR ts - prev_ts > gap
    session = SUM(is_new) OVER (series ORDER BY ts ROWS UNBOUNDED PRECEDING)

lag + running sum share one (partition, order) pair, so the whole op
costs ONE hash exchange + ONE sort; the sum consumes the lag's output,
so Catalyst plans TWO pipelined WindowExec nodes over that single sort
— still no iterative/driver-side pass (plan budget asserted in
tools/plan_audit.py, max_window=2).  Gap arithmetic runs on int64
microseconds: exact, no float drift on the boundary.

At 100 TB the per-series state is one running counter; skewed series
fall under the same chunked/AQE story as the rolling ops.  DuckDB
replays the identical prefix-sum in the ``sessionize_1h`` /
``session_stats_1h`` driver oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from roll_spark.operators.base import Cols, _as_list
from roll_spark.operators.time_windows import _epoch_micros


def sessionize(
    df: DataFrame,
    by: Cols,
    order: str,
    gap_s: float,
    *,
    out: str = "session_id",
) -> DataFrame:
    """Append 1-based ``out`` numbering each series' sessions in time
    order; a new session starts when the gap STRICTLY exceeds ``gap_s``."""
    keys = _as_list(by)
    # materialize the epoch ONCE: both window specs must order by the
    # same attribute, or Catalyst plans a second (degenerate) sort
    t_col = "__sess_t_us"
    s = df.withColumn(t_col, _epoch_micros(df, order))
    t_us = F.col(t_col)
    w = Window.partitionBy(*keys).orderBy(t_us)
    prev = F.lag(t_us).over(w)
    gap_us = F.lit(int(round(gap_s * 1_000_000)))
    is_new = F.when(prev.isNull() | ((t_us - prev) > gap_us), 1).otherwise(0)
    sid = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return s.withColumn(out, sid).drop(t_col)


def session_stats(
    df: DataFrame,
    by: Cols,
    order: str,
    gap_s: float,
    *,
    value: str | None = None,
) -> DataFrame:
    """Per-session aggregates: start/end/duration/event count (+ mean of
    ``value`` if given).  One extra hash exchange on (series, session)
    over :func:`sessionize`, with map-side partial aggregation."""
    keys = _as_list(by)
    s = sessionize(df, by, order, gap_s)
    aggs = [
        F.min(order).alias("session_start"),
        F.max(order).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value is not None:
        aggs.append(F.avg(value).alias(f"mean_{value}"))
    out = s.groupBy(*keys, "session_id").agg(*aggs)
    dur = (
        F.unix_micros(F.col("session_end").cast("timestamp"))
        - F.unix_micros(F.col("session_start").cast("timestamp"))
    ) / F.lit(1_000_000.0)
    return out.withColumn("duration_s", dur)


def event_transitions(
    df: DataFrame,
    by: Cols,
    order: str,
    type_col: str,
) -> DataFrame:
    """Markov transition counts over a categorical turn stream: for each
    series ordered by ``order``, count (previous type -> type) adjacent
    pairs across the whole corpus. The agent-telemetry twin of
    roll_entropy — the transition matrix is what a loop/behavior
    detector fits, and a near-diagonal matrix is the batch-level
    signature of stuck agents.

    Plan: ONE lag window (one exchange + one sort, same budget as
    sessionize) + ONE hash aggregate with map-side partials; output is
    |types|^2 rows regardless of input size.

    Precondition: (by, order) must be UNIQUE per row (the same contract
    as _asof_marks' dedup note) — lag over tied ``order`` values is
    free to order them differently run-to-run (and differently from a
    SQL oracle), flipping which adjacent pair each tie contributes to.
    Transcript tables keyed by (conv_id, turn_idx) satisfy this by
    construction; for a timestamp order with possible ties, pass a
    composite/deduplicated order column."""
    keys = _as_list(by)
    w = Window.partitionBy(*keys).orderBy(order)
    prev = F.lag(F.col(type_col)).over(w)
    return (
        df.select(prev.alias("from_type"), F.col(type_col).alias("to_type"))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
