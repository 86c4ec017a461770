"""asof_join vs the pandas.merge_asof oracle + plan-shape guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from roll_spark.plans.asof import asof_join

SEED = 20260817


def _fixture(n_left=400, n_right=120, n_keys=7, ts=False):
    rng = np.random.default_rng(SEED)
    lk = rng.integers(0, n_keys, n_left)
    rk = rng.integers(0, n_keys + 2, n_right)  # some right-only keys
    lon = np.round(rng.uniform(0, 1000, n_left), 1)
    ron = np.round(rng.uniform(0, 1000, n_right), 1)
    # force exact-match collisions to pin inclusivity
    ron[:20] = lon[:20]
    left = pd.DataFrame(
        {"k": lk, "on": lon, "lv": rng.normal(size=n_left).round(3)}
    )
    right = pd.DataFrame({"k": rk, "on": ron, "rv": rng.normal(size=n_right).round(3)})
    right = right.drop_duplicates(["k", "on"])
    if ts:
        base = pd.Timestamp("2024-01-01")
        left["on"] = base + pd.to_timedelta(left["on"], unit="s")
        right["on"] = base + pd.to_timedelta(right["on"], unit="s")
    return left, right


def _oracle(left, right, direction, tolerance=None):
    tol = None
    if tolerance is not None:
        tol = (
            pd.Timedelta(seconds=tolerance)
            if pd.api.types.is_datetime64_any_dtype(left["on"])
            else tolerance
        )
    exp = pd.merge_asof(
        left.sort_values(["on", "k"], kind="mergesort"),
        right.sort_values(["on", "k"], kind="mergesort").rename(
            columns={"on": "on_matched"}
        ),
        left_on="on",
        right_on="on_matched",
        by="k",
        direction=direction,
        tolerance=tol,
    )
    return exp


def _run(spark, left, right, direction, tolerance=None):
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="on",
        by="k",
        direction=direction,
        tolerance=tolerance,
    ).toPandas()
    return got


def _compare(got, exp):
    key = ["k", "on", "lv"]
    got = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    exp = exp.sort_values(key, kind="mergesort").reset_index(drop=True)
    exp = exp[got.columns]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("ts", [False, True])
def test_asof_matches_pandas(spark, direction, ts):
    left, right = _fixture(ts=ts)
    _compare(_run(spark, left, right, direction), _oracle(left, right, direction))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tolerance(spark, direction):
    left, right = _fixture(ts=True)
    got = _run(spark, left, right, direction, tolerance=30.0)
    exp = _oracle(left, right, direction, tolerance=30.0)
    _compare(got, exp)
    # tolerance must actually bite on this fixture
    full = _run(spark, left, right, direction)
    assert got["rv"].notna().sum() < full["rv"].notna().sum()


def test_asof_tolerance_timestamp_ntz(spark):
    """Parquet timestamps arrive as TIMESTAMP_NTZ, which has no direct
    double cast — the tolerance path must detour through timestamp."""
    from pyspark.sql import functions as F

    left, right = _fixture(ts=True)
    l = spark.createDataFrame(left).withColumn("on", F.col("on").cast("timestamp_ntz"))
    r = spark.createDataFrame(right).withColumn("on", F.col("on").cast("timestamp_ntz"))
    got = asof_join(l, r, on="on", by="k", tolerance=30.0).toPandas()
    _compare(got, _oracle(left, right, "backward", tolerance=30.0))


def test_asof_exact_match_inclusive(spark):
    left = pd.DataFrame({"k": [1, 1], "on": [5.0, 4.0], "lv": [0.1, 0.2]})
    right = pd.DataFrame({"k": [1], "on": [5.0], "rv": [9.9]})
    got = _run(spark, left, right, "backward").set_index("on")
    assert got.loc[5.0, "rv"] == 9.9  # equal ts matches (inclusive)
    assert np.isnan(got.loc[4.0, "rv"])  # nothing at-or-before 4.0
    fwd = _run(spark, left, right, "forward").set_index("on")
    assert fwd.loc[5.0, "rv"] == 9.9
    assert fwd.loc[4.0, "rv"] == 9.9


def test_asof_right_col_clash(spark):
    left, right = _fixture()
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right.rename(columns={"rv": "lv"})),
            on="on",
            by="k",
        )


def test_asof_plan_shape(spark):
    """ONE exchange + ONE sort + ONE window; never a nested-loop/range join."""
    left, right = _fixture()
    plan = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="on",
        by="k",
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    import re

    # AQE may add read-side coalesces; count true shuffle writes
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\bSort\b", plan)) == 1
