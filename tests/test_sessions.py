"""sessionize / session_stats vs a per-series pandas oracle + plan shape."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from roll_spark.plans.sessions import session_stats, sessionize

SEED = 7812


def _fixture(n=500, n_keys=5):
    rng = np.random.default_rng(SEED)
    k = rng.integers(0, n_keys, n)
    offs = np.cumsum(rng.exponential(1500, n))  # gaps straddle 1h
    # floor to µs — Spark timestamp precision (see test_time_windows)
    ts = (pd.Timestamp("2024-05-01") + pd.to_timedelta(offs, unit="s")).floor("us")
    v = rng.normal(size=n).round(3)
    return (
        pd.DataFrame({"k": k, "ts": ts, "v": v})
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )


def _oracle_sessions(pdf, gap_s):
    sid = np.zeros(len(pdf), dtype=np.int64)
    for key, g in pdf.groupby("k"):
        gaps = g["ts"].diff().dt.total_seconds()
        new = (gaps.isna() | (gaps > gap_s)).to_numpy().astype(np.int64)
        sid[g.index.to_numpy()] = np.cumsum(new)
    return sid


def test_sessionize_matches_oracle(spark):
    pdf = _fixture()
    got = (
        sessionize(spark.createDataFrame(pdf), "k", "ts", 3600.0)
        .toPandas()
        .sort_values(["k", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = _oracle_sessions(pdf, 3600.0)
    assert got["session_id"].to_numpy().tolist() == want.tolist()
    assert got["session_id"].min() == 1
    # this fixture must actually split (otherwise the test proves nothing)
    assert got.groupby("k")["session_id"].max().min() > 1


def test_sessionize_boundary_exact_gap_continues(spark):
    """A gap of EXACTLY gap_s does not break the session (strict >)."""
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 01:00:00", "2024-01-01 02:00:00.000001"],
        format="ISO8601",
    )
    pdf = pd.DataFrame({"k": 1, "ts": ts, "v": 1.0})
    got = (
        sessionize(spark.createDataFrame(pdf), "k", "ts", 3600.0)
        .toPandas().sort_values("ts")
    )
    assert got["session_id"].tolist() == [1, 1, 2]


def test_session_stats_matches_oracle(spark):
    pdf = _fixture()
    got = (
        session_stats(spark.createDataFrame(pdf), "k", "ts", 3600.0, value="v")
        .toPandas()
        .sort_values(["k", "session_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    pdf2 = pdf.assign(session_id=_oracle_sessions(pdf, 3600.0))
    exp = (
        pdf2.groupby(["k", "session_id"])
        .agg(session_start=("ts", "min"), session_end=("ts", "max"),
             n_events=("ts", "size"), mean_v=("v", "mean"))
        .reset_index()
    )
    exp["duration_s"] = (exp["session_end"] - exp["session_start"]).dt.total_seconds()
    exp = exp[got.columns]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sessionize_plan_shape(spark):
    pdf = _fixture(100)
    plan = (
        sessionize(spark.createDataFrame(pdf), "k", "ts", 3600.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # lag (offset frame) + running sum (rows frame) are two WindowExecs,
    # but they SHARE the one exchange and one sort — no extra shuffle
    assert plan.count("Window") <= 2
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\bSort \[", plan)) == 1
