"""Stateful streaming rolling statistics — applyInPandasWithState over
the online kernels.

The batch engine's Arrow path evaluates a whole series per task; a LIVE
transcript stream instead delivers each conversation's turns
incrementally across micro-batches. This module keeps the rolling
computation exactly incremental: per (series) group, the micro-batch's
rows are folded through the sequential ``online_*`` kernels
(roll_spark.operators.kernels) and the kernel's carry — trailing window
values plus the running sums / dual multisets — is persisted in the
Structured Streaming state store between batches. The reference's own
"online" algorithms (roll_vec.h:383 sum recursion, :1694 dual-multiset
quantile) are exactly this shape; here the state store supplies the
cross-batch memory their single pass assumes.

Correctness contract: rows must arrive IN (series, order) ORDER across
micro-batches (append-only transcript tails — turn k+1 never lands in
an earlier batch than turn k). Within a micro-batch rows are sorted by
the order column before folding, so any intra-batch shuffling is fine;
cross-batch disorder is the caller's watermarking problem, the same
contract run_stream_to_tier enforces for tier buckets. The streamed
output is proven row-identical to the batch operators in
tests/test_streaming_rolling.py.

Scale shape: state per key is O(width) floats (the trailing window),
partitioned by the series key across executors by the state store —
10^9 conversations at width 100 is ~800 GB of state spread over the
cluster, the same order as any per-key windowed aggregation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as TT
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from roll_spark.operators import kernels as K
from roll_spark.operators.base import Cols, _as_list

# A numeric order column is interpreted as epoch-SECONDS (the engine-wide
# _epoch_micros convention, time_windows.py:40). This CHANGED from
# epoch-microseconds in 0.3.0 — a caller still passing epoch-µs would get
# t*1e6 values past int64 range and silent garbage event times, so reject
# anything implausibly large for seconds: 1e12 s is year ~33658, while
# today's epoch-µs values are ~1.7e15. Documented in README (breaking
# changes, 0.4.0).
_MAX_PLAUSIBLE_EPOCH_SECONDS = 1e12


def _numeric_order_to_us(o: pd.Series) -> np.ndarray:
    v = o.to_numpy(dtype=np.float64)
    if v.size and np.nanmax(np.abs(v)) > _MAX_PLAUSIBLE_EPOCH_SECONDS:
        raise ValueError(
            "numeric order column looks like epoch-microseconds (max "
            f"|value| {np.nanmax(np.abs(v)):.3g} > {_MAX_PLAUSIBLE_EPOCH_SECONDS:g}); "
            "since 0.4.0 numeric order values are epoch-SECONDS — divide "
            "by 1e6 or pass a timestamp column"
        )
    return np.round(v * 1e6).astype(np.int64)

# op name -> (kernel, state pack/unpack as flat double arrays)
_OPS = ("mean", "sum", "var", "quantile", "cov", "ewma", "min", "max",
        "idxmin", "idxmax", "scale", "prod")


def stream_roll(
    sdf: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    op: str = "mean",
    p: float = 0.5,
    y: str | None = None,
    min_obs: int = 1,
    halflife_s: float | None = None,
    out: str = "roll_out",
) -> DataFrame:
    """Rolling ``op`` over a streaming DataFrame, one output row per
    input row, state carried per series across micro-batches.

    op: 'mean' | 'sum' | 'var' (Welford) | 'min' | 'max' (trailing-
    window reduce over the carried hist) | 'idxmin' | 'idxmax'
    (window-relative extreme index, most-recent ties; the carry adds
    the global row count for the expanding-phase series position) |
    'scale' (z-score of the most recent non-NA window value, Welford
    carry shared with 'var') | 'prod' (direct window nanprod over the
    carried hist — exact zeros/signs; streaming any/all are stream
    min/max over a derived 0/1 column) | 'quantile' (equal-weight
    dual multiset, HF2 emission at ``p``) | 'cov' (bivariate Welford
    co-moment over ``value`` and ``y``, pairwise-complete) | 'ewma'
    (time-decay EWMA over the ORDER column's event time at
    ``halflife_s`` — expanding, so ``width`` is ignored; the carry is
    three numbers, the cheapest state in the family).
    """
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")
    if op == "cov" and y is None:
        raise ValueError("op='cov' needs the second series column y")
    if op == "ewma" and halflife_s is None:
        raise ValueError("op='ewma' needs halflife_s")
    by_l = _as_list(by)
    order_l = _as_list(order)
    if len(order_l) != 1:
        raise ValueError("stream_roll needs exactly one order column")
    ocol = order_l[0]

    by_fields = [f for f in sdf.schema if f.name in by_l]
    order_field = [f for f in sdf.schema if f.name == ocol][0]
    out_schema = TT.StructType(
        by_fields + [order_field, TT.StructField(out, TT.DoubleType())]
    )
    # state: the kernel carry flattened to double arrays (hist may hold
    # NaNs for missing turns; lower/upper are the quantile multisets)
    state_schema = TT.StructType([
        TT.StructField("hist", TT.ArrayType(TT.DoubleType())),
        TT.StructField("aux", TT.ArrayType(TT.DoubleType())),
        TT.StructField("lower", TT.ArrayType(TT.DoubleType())),
        TT.StructField("upper", TT.ArrayType(TT.DoubleType())),
    ])

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            hist, aux, lower, upper = state.get
            kstate = _unpack(op, list(hist), list(aux), list(lower), list(upper))
        else:
            kstate = None
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            # same guard as streaming/sessions.py: an empty group batch
            # (possible under future timeout modes) yields nothing and
            # leaves state untouched instead of crashing on concat.
            return
        batch = pd.concat(frames, ignore_index=True)
        batch = batch.sort_values(ocol, kind="stable")
        x = batch[value].to_numpy(dtype=np.float64, na_value=np.nan)
        if op == "mean":
            res, kstate = K.online_mean(x, width, min_obs=min_obs, state=kstate)
        elif op == "sum":
            res, kstate = K.online_sum(x, width, min_obs=min_obs, state=kstate)
        elif op == "var":
            res, kstate = K.online_var(x, width, min_obs=min_obs, state=kstate)
        elif op == "scale":
            res, kstate = K.online_scale(x, width, min_obs=min_obs,
                                         state=kstate)
        elif op == "cov":
            yv = batch[y].to_numpy(dtype=np.float64, na_value=np.nan)
            res, kstate = K.online_cov(x, yv, width, min_obs=min_obs,
                                       state=kstate)
        elif op in ("min", "max"):
            res, kstate = K.online_minmax(x, width, mode=op,
                                          min_obs=min_obs, state=kstate)
        elif op == "prod":
            res, kstate = K.online_prod(x, width, min_obs=min_obs,
                                        state=kstate)
        elif op in ("idxmin", "idxmax"):
            res, kstate = K.online_idxminmax(x, width, mode=op[3:],
                                             min_obs=min_obs, state=kstate)
        elif op == "ewma":
            o = batch[ocol]
            if str(o.dtype).startswith("datetime64"):
                t_us = o.astype("int64").to_numpy() // 1000  # ns -> us
            else:
                # numeric order column: SECONDS, the same convention as
                # the batch engine's _epoch_micros (time_windows.py:40) —
                # a batch ewma_time pipeline ported to streaming keeps
                # its decay rate unchanged. Guarded against epoch-µs
                # callers (int64 overflow) — see _numeric_order_to_us.
                t_us = _numeric_order_to_us(o)
            res, kstate = K.online_ewma_time(x, t_us, halflife_s,
                                             min_obs=min_obs, state=kstate)
        else:
            res, kstate = K.online_quantile(x, width, p, min_obs=min_obs,
                                            state=kstate)
        state.update(_pack(op, kstate))
        data = {c: batch[c].to_numpy() for c in by_l + [ocol]}
        data[out] = res
        yield pd.DataFrame(data)

    return sdf.groupBy(*by_l).applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def _pack(op: str, s: dict) -> tuple:
    # plain python floats only: the state tuple is pickled into the JVM
    # state store, which rejects numpy scalar types
    if op == "cov":
        # hist holds (x, y) pairs: interleave into the flat array
        hist = [float(v) for xy in s["hist"] for v in xy]
        return (hist, [float(s["n_obs"]), float(s["mx"]), float(s["my"]),
                       float(s["C"])], [], [])
    if op == "ewma":
        # no trailing window — three carry numbers + the observed count
        return ([], [float(s["num"]), float(s["den"]), float(s["t"]),
                     float(s["n_obs"])], [], [])
    hist = [float(v) for v in s["hist"]]
    if op in ("min", "max", "prod"):
        return (hist, [float(s["n_obs"])], [], [])
    if op in ("idxmin", "idxmax"):
        return (hist, [float(s["r"])], [], [])
    if op == "mean":
        aux = [float(s["sum_w"]), float(s["sum_x"]), float(s["n_obs"])]
        return (hist, aux, [], [])
    if op == "sum":
        return (hist, [float(s["sum_x"]), float(s["n_obs"])], [], [])
    if op in ("var", "scale"):
        return (hist, [float(s["n_obs"]), float(s["mean"]), float(s["M2"])],
                [], [])
    return (hist, [], [float(v) for v in s["lower"]],
            [float(v) for v in s["upper"]])


def _unpack(op: str, hist, aux, lower, upper) -> dict:
    if op == "cov":
        pairs = [(hist[i], hist[i + 1]) for i in range(0, len(hist), 2)]
        return {"n_obs": int(aux[0]), "mx": aux[1], "my": aux[2],
                "C": aux[3], "hist": pairs}
    if op in ("min", "max", "prod"):
        return {"hist": hist, "n_obs": int(aux[0])}
    if op in ("idxmin", "idxmax"):
        return {"hist": hist, "r": int(aux[0])}
    if op == "mean":
        return {"sum_w": aux[0], "sum_x": aux[1], "n_obs": int(aux[2]),
                "hist": hist}
    if op == "sum":
        return {"sum_x": aux[0], "n_obs": int(aux[1]), "hist": hist}
    if op in ("var", "scale"):
        return {"n_obs": int(aux[0]), "mean": aux[1], "M2": aux[2],
                "hist": hist}
    if op == "ewma":
        return {"num": aux[0], "den": aux[1], "t": aux[2],
                "n_obs": int(aux[3])}
    return {"lower": lower, "upper": upper, "hist": hist}
