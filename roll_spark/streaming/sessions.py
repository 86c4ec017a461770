"""Stateful streaming sessionization — gap-based session ids assigned
incrementally as transcript/event tails stream in.

The batch operator (plans/sessions.sessionize) is a lag + prefix-sum
over the whole series; on a live stream the series arrives in pieces,
so the prefix is carried in the Structured Streaming state store: per
series key the state is TWO numbers — the last seen event time (int64
microseconds, the engine-wide exact-gap convention) and the running
session counter. Each micro-batch folds its (sorted) rows through the
same `gap > threshold -> new session` rule the batch plan uses, so the
streamed ids are row-identical to a batch sessionize over the union of
all micro-batches (driver-gated in stream_sessionize_1h against the
SAME DuckDB oracle as sessionize_1h).

Ordering contract: identical to streaming/rolling.py — rows must
arrive in (series, order) order ACROSS micro-batches (append-only
tails); within a batch rows are sorted before folding.

Scale shape: state per key is 2 floats — cheaper than any rolling op;
10^9 live conversations is ~16 GB of state across the cluster's state
stores.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as TT
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from roll_spark.operators.base import Cols, _as_list
from roll_spark.streaming.rolling import _numeric_order_to_us


def stream_sessionize(
    sdf: DataFrame,
    by: Cols,
    order: str,
    gap_s: float,
    *,
    out: str = "session_id",
) -> DataFrame:
    """Streaming twin of plans/sessions.sessionize: one output row per
    input row with its 1-based session id, session boundaries carried
    across micro-batches in the state store."""
    by_l = _as_list(by)
    gap_us = int(round(gap_s * 1_000_000))

    by_fields = [f for f in sdf.schema if f.name in by_l]
    order_field = [f for f in sdf.schema if f.name == order][0]
    out_schema = TT.StructType(
        by_fields + [order_field, TT.StructField(out, TT.LongType())]
    )
    # (last event time in µs, running session counter)
    state_schema = TT.StructType([
        TT.StructField("last_t_us", TT.DoubleType()),
        TT.StructField("sess", TT.DoubleType()),
    ])

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        last_t, sess = state.get if state.exists else (None, 0.0)
        parts = [p for p in pdfs if len(p)]
        if not parts:
            # NoTimeout mode never delivers empty groups today, but a
            # timeout-mode or Spark-version change shouldn't crash the
            # query: yield nothing, leave state untouched.
            return
        batch = pd.concat(parts, ignore_index=True)
        batch = batch.sort_values(order, kind="stable")
        o = batch[order]
        if str(o.dtype).startswith("datetime64"):
            t_us = o.astype("int64").to_numpy() // 1000  # ns -> µs
        else:
            # numeric order column: SECONDS (the engine-wide
            # _epoch_micros convention, same as stream_roll/ewma_time);
            # shared epoch-µs overflow guard
            t_us = _numeric_order_to_us(o)
        prev = np.empty_like(t_us)
        if last_t is None:
            prev[0] = np.iinfo(np.int64).min // 2  # forces a new session
        else:
            prev[0] = int(last_t)
        prev[1:] = t_us[:-1]
        is_new = (t_us - prev) > gap_us
        if last_t is None:
            is_new[0] = True
        ids = int(sess) + np.cumsum(is_new.astype(np.int64))
        state.update((float(t_us[-1]), float(ids[-1])))
        data = {c: batch[c].to_numpy() for c in by_l + [order]}
        data[out] = ids
        yield pd.DataFrame(data)

    return sdf.groupBy(*by_l).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
