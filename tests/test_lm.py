"""roll_lm native path vs (a) the per-window weighted-OLS oracle and
(b) numpy polyfit / classic OLS formulas on a clean window — porting the
reference's lm-vs-stats::lm test axis (test-zoo.R via helper-zoo.R:109)."""

from __future__ import annotations

import numpy as np
import pytest

from roll_spark.operators.lm import roll_lm
from tests import oracle
from tests.conftest import collect_all
from tests.test_window_ops import VARIANTS, assert_close


@pytest.mark.parametrize("width", [3, 5, 10, 15])
@pytest.mark.parametrize("intercept", [True, False])
def test_lm_grid(spark, grid_df, grid_pairs, width, intercept):
    for min_obs in (1, 5):
        sdf = roll_lm(
            grid_df, "x", "y", "series_id", "i", width,
            intercept=intercept, min_obs=min_obs,
        )
        cols = ["lm_coef_x", "lm_r2", "lm_se_x"] + (
            ["lm_intercept", "lm_se_intercept"] if intercept else []
        )
        got = {c: collect_all(sdf, c) for c in cols}
        for variant in VARIANTS:
            x, y = grid_pairs[variant]
            want = oracle.roll_lm(x, y, width, min_obs=min_obs, intercept=intercept)
            key_map = {
                "lm_coef_x": "coef_x",
                "lm_r2": "r2",
                "lm_se_x": "se_x",
                "lm_intercept": "intercept",
                "lm_se_intercept": "se_intercept",
            }
            for c in cols:
                assert_close(
                    got[c][variant], want[key_map[c]],
                    f"lm.{c} w={width} mo={min_obs} int={intercept} {variant}",
                )


def test_lm_matches_classic_ols(spark, grid_df, grid_pairs):
    """On a full clean window, coef/intercept must equal np.polyfit and
    se/r2 the classic OLS formulas — the stats::lm equivalence."""
    x, y = grid_pairs["rand_zeros"]  # no NAs
    width = 10
    sdf = roll_lm(grid_df, "x", "y", "series_id", "i", width, min_obs=width)
    got_b = collect_all(sdf, "lm_coef_x")["rand_zeros"]
    got_a = collect_all(sdf, "lm_intercept")["rand_zeros"]
    got_r2 = collect_all(sdf, "lm_r2")["rand_zeros"]
    got_se = collect_all(sdf, "lm_se_x")["rand_zeros"]
    got_sea = collect_all(sdf, "lm_se_intercept")["rand_zeros"]
    for i in range(width - 1, len(x)):
        wx, wy = x[i - width + 1 : i + 1], y[i - width + 1 : i + 1]
        beta, alpha = np.polyfit(wx, wy, 1)
        assert np.isclose(got_b[i], beta, rtol=1e-8), i
        assert np.isclose(got_a[i], alpha, rtol=1e-8), i
        resid = wy - (alpha + beta * wx)
        ss_res = (resid**2).sum()
        ss_tot = ((wy - wy.mean()) ** 2).sum()
        r2 = 1 - ss_res / ss_tot
        assert np.isclose(got_r2[i], r2, rtol=1e-8), i
        sxx = ((wx - wx.mean()) ** 2).sum()
        se = np.sqrt(ss_res / (width - 2) / sxx)
        assert np.isclose(got_se[i], se, rtol=1e-8), i
        sea = np.sqrt(ss_res / (width - 2) * (1 / width + wx.mean() ** 2 / sxx))
        assert np.isclose(got_sea[i], sea, rtol=1e-8), i


def test_lm_predict_identity_and_plan(spark, grid_df):
    """y_hat == alpha + beta*x and resid == y - y_hat wherever the fit
    exists, NULL where gated; the projections add ZERO WindowExec over
    the bare fit."""
    from roll_spark.operators.lm import roll_lm, roll_lm_predict

    fit = roll_lm(grid_df, "x", "y", "series_id", "i", 10, min_obs=5)
    pred = roll_lm_predict(grid_df, "x", "y", "series_id", "i", 10,
                           min_obs=5)
    f = {(r.series_id, r.i): r for r in fit.collect()}
    for r in pred.collect():
        base = f[(r.series_id, r.i)]
        if base.lm_coef_x is None or r.x is None:
            assert r.lm_y_hat is None and r.lm_resid is None
        else:
            want = base.lm_intercept + base.lm_coef_x * r.x
            assert r.lm_y_hat == pytest.approx(want, rel=0, abs=1e-12)
            if r.y is None:
                assert r.lm_resid is None
            else:
                assert r.lm_resid == pytest.approx(r.y - want, rel=0, abs=1e-12)
    plan_fit = fit._jdf.queryExecution().executedPlan().toString()
    plan_pred = pred._jdf.queryExecution().executedPlan().toString()
    assert plan_pred.count("Window [") == plan_fit.count("Window [")
