"""roll_time vs a brute-force inclusive-bounds oracle + plan shape."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from roll_spark.operators.time_windows import roll_time

SEED = 6021


def _fixture(n=600, n_keys=6):
    rng = np.random.default_rng(SEED)
    k = rng.integers(0, n_keys, n)
    # bursty arrivals: many rows inside an hour, plus long gaps
    offs = np.cumsum(rng.exponential(900, n))
    # floor to µs: Spark timestamps are µs, pandas are ns — a sub-µs
    # remainder would round differently on the two sides of the oracle
    ts = (pd.Timestamp("2024-03-01") + pd.to_timedelta(offs, unit="s")).floor("us")
    v = rng.normal(size=n).round(3)
    v[rng.random(n) < 0.1] = np.nan
    pdf = pd.DataFrame({"k": k, "ts": ts, "v": v})
    return pdf.sort_values(["k", "ts"]).reset_index(drop=True)


def _brute(pdf, dur_s, agg, min_obs):
    out = np.full(len(pdf), np.nan)
    t = pdf["ts"].astype("int64").to_numpy() / 1e9
    for i in range(len(pdf)):
        m = (
            (pdf["k"].to_numpy() == pdf["k"].iloc[i])
            & (t >= t[i] - dur_s)
            & (t <= t[i])
        )
        vals = pdf.loc[m, "v"].dropna()
        if agg == "count":
            out[i] = len(vals)
            continue
        if len(vals) < min_obs:
            continue
        out[i] = getattr(vals, {"mean": "mean", "sum": "sum", "min": "min",
                                "max": "max", "sd": "std"}[agg])()
    return out


@pytest.mark.parametrize("agg,min_obs", [("mean", 3), ("sum", 1), ("min", 1),
                                         ("max", 1), ("count", 1), ("sd", 2)])
def test_roll_time_matches_brute(spark, agg, min_obs):
    pdf = _fixture()
    got = (
        roll_time(spark.createDataFrame(pdf), "v", "k", "ts", 3600.0,
                  aggs=[agg], min_obs=min_obs)
        .toPandas()
        .sort_values(["k", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = _brute(pdf, 3600.0, agg, min_obs)
    np.testing.assert_allclose(got[f"t_{agg}"].to_numpy(dtype=float), want,
                               rtol=1e-9, atol=1e-12, equal_nan=True)


def test_roll_time_inclusive_bounds(spark):
    """A row exactly duration seconds back IS in the window (RANGE
    BETWEEN ... PRECEDING AND CURRENT ROW is closed on both ends)."""
    pdf = pd.DataFrame({
        "k": [1, 1, 1],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:30:00",
                              "2024-01-01 01:00:00"]),
        "v": [1.0, 10.0, 100.0],
    })
    got = (
        roll_time(spark.createDataFrame(pdf), "v", "k", "ts", 3600.0,
                  aggs=["sum", "count"])
        .toPandas().sort_values("ts")
    )
    assert got["t_sum"].tolist() == [1.0, 11.0, 111.0]
    # one µs past the bound falls out
    pdf2 = pdf.copy()
    pdf2.loc[2, "ts"] = pdf2.loc[2, "ts"] + pd.Timedelta(microseconds=1)
    got2 = (
        roll_time(spark.createDataFrame(pdf2), "v", "k", "ts", 3600.0,
                  aggs=["sum"])
        .toPandas().sort_values("ts")
    )
    assert got2["t_sum"].tolist() == [1.0, 11.0, 110.0]


def test_roll_time_numeric_order(spark):
    pdf = pd.DataFrame({"k": 1, "o": [0.0, 1.5, 2.0, 10.0], "v": [1.0, 2.0, 4.0, 8.0]})
    got = (
        roll_time(spark.createDataFrame(pdf), "v", "k", "o", 2.0, aggs=["sum"])
        .toPandas().sort_values("o")
    )
    assert got["t_sum"].tolist() == [1.0, 3.0, 7.0, 8.0]


def test_roll_time_plan_shape(spark):
    pdf = _fixture(100)
    plan = (
        roll_time(spark.createDataFrame(pdf), "v", "k", "ts", 60.0,
                  aggs=["mean", "sum", "count", "min"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1  # all aggs share one RANGE frame
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\bSort \[", plan)) == 1


def test_roll_time_rejects_unknown_agg(spark):
    pdf = _fixture(10)
    with pytest.raises(ValueError, match="unknown aggs"):
        roll_time(spark.createDataFrame(pdf), "v", "k", "ts", 60.0, aggs=["p99"])
