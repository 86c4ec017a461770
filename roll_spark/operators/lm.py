"""roll_lm — rolling weighted least squares.

Reference shape (SURVEY.md §3.3; /root/reference/src/roll.cpp:2017-2117,
roll_mat.h:5513-5614): phase 1 computes, per row, the centered unbiased
co-moment matrix of cbind(x, y) plus side outputs (n_obs, sum_w, means);
phase 2 solves the normal equations A beta = b per row and derives
intercept, R^2 and standard errors.

Single-regressor path (this module, native Catalyst): the 2x2 system
has a closed form, so BOTH phases collapse into column expressions over
one Window — rolling sums of (1, x, y, x^2, xy, y^2) feed the textbook
formulas. The physical plan is a single Exchange + Sort + WindowExec,
followed by scalar projections: nothing leaves the JVM.

Emit rules replicated from RollLmMatInterceptTRUE/FALSE:
- rows with any NA in (x, y) are excluded everywhere (complete_obs is
  forced TRUE with a warning in the reference, src/roll.cpp:2059-2066);
- whole row NULL unless n_obs >= max(min_obs, df_fit) where df_fit =
  (#regressors + intercept);
- singular system (Sxx == 0) -> whole row NULL (arma::solve no_approx);
- r2 NULL unless var_y > eps;
- se NULL unless df_resid = n_obs - df_fit > 0;
- se_intercept^2 = var_resid * (1/sum_w + mean_x * A^-1 * mean_x).

The k-regressor general case lives in the Arrow kernel path
(roll_spark.operators.arrow_ops.roll_lm_k) using rolling XtX/Xty.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from roll_spark.config import EPS, RollSpec
from roll_spark.operators.base import Cols, rolling_window


def roll_lm(
    df: DataFrame,
    x: str,
    y: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    intercept: bool = True,
    min_obs: int | None = None,
    weights: Sequence[float] | None = None,
    out_prefix: str = "lm_",
) -> DataFrame:
    """Rolling OLS of y on x. Adds columns ``{p}coef_x {p}intercept
    {p}r2 {p}se_x {p}se_intercept`` (intercept columns only when
    intercept=True)."""
    spec = RollSpec(
        width=width,
        weights=None if weights is None else tuple(weights),
        min_obs=min_obs,
    )
    if not spec.is_equal_weight:
        from roll_spark.operators import arrow_ops

        return arrow_ops.roll_lm(
            df, x, y, by, order, spec, intercept=intercept, out_prefix=out_prefix
        )

    w = rolling_window(by, order, width)
    xc, yc = F.col(x), F.col(y)
    both = xc.isNotNull() & yc.isNotNull()
    xm = F.when(both, xc)
    ym = F.when(both, yc)

    n = F.count(F.when(both, F.lit(1))).over(w).cast("double")
    sx = F.sum(xm).over(w)
    sy = F.sum(ym).over(w)
    sxx = F.sum(xm * xm).over(w)
    sxy = F.sum(xm * ym).over(w)
    syy = F.sum(ym * ym).over(w)

    df_fit = 2 if intercept else 1
    if intercept:
        # centered sums of squares (equal weights: sum_w = n, denom = n-1)
        Sxx = sxx - sx * sx / n
        Sxy = sxy - sx * sy / n
        Syy = syy - sy * sy / n
    else:
        Sxx, Sxy, Syy = sxx, sxy, syy

    gate = (n >= F.lit(max(spec.effective_min_obs, df_fit))) & (n > 1) & (Sxx != 0)
    # RAW centered moments: roll_lm's phase-1 matrix is the (centered)
    # crossprod, NOT the unbiased covariance (src/roll.cpp:2069-2087) —
    # with var_resid = (1-R2) Syy / df_resid this reproduces stats::lm's
    # standard errors exactly
    A = Sxx
    var_y = Syy
    beta = F.when(gate, Sxy / Sxx)
    r2 = F.when(gate & (var_y > F.lit(EPS)), beta * A * beta / var_y)
    df_resid = n - F.lit(df_fit)
    var_resid = (F.lit(1.0) - r2) * var_y / df_resid
    se_x = F.when(gate & (df_resid > 0), F.sqrt(var_resid / A))

    p = out_prefix
    # one withColumns call => ONE Window node: chained withColumn would give
    # Catalyst a Project between each window expression, preventing window
    # collapsing — the plan then re-evaluates all six rolling sums per output
    # column (6 WindowExecs, ~5x redundant work over the same frame)
    cols = {p + "coef_x": beta, p + "r2": r2, p + "se_x": se_x}
    if intercept:
        mean_x, mean_y = sx / n, sy / n
        cols[p + "intercept"] = F.when(gate, mean_y - mean_x * beta)
        cols[p + "se_intercept"] = F.when(
            gate & (df_resid > 0),
            F.sqrt(var_resid * (F.lit(1.0) / n + mean_x * mean_x / A)),
        )
    return df.withColumns(cols)


def roll_lm_predict(
    df: DataFrame,
    x: str,
    y: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    intercept: bool = True,
    min_obs: int | None = None,
    weights: Sequence[float] | None = None,
    out_prefix: str = "lm_",
) -> DataFrame:
    """Rolling OLS with in-sample prediction and residual at each row:
    ``{p}y_hat = alpha_t + beta_t * x_t`` (no alpha when
    intercept=False) and ``{p}resid = y_t - y_hat_t``, NULL wherever
    the fit itself is gated (min_obs / degenerate Sxx).

    The residual stream is the anomaly-detection view of rolling OLS —
    |resid| spiking against its own rolling sd flags a structural
    break in the series (an agent leaving a loop, a latency regime
    change) — and costs NOTHING beyond the fit: pure projections over
    the same single WindowExec (verified: plan shape identical to
    roll_lm's).
    """
    fitted = roll_lm(
        df, x, y, by, order, width, intercept=intercept,
        min_obs=min_obs, weights=weights, out_prefix=out_prefix,
    )
    p = out_prefix
    yhat = F.col(p + "coef_x") * F.col(x)
    if intercept:
        yhat = yhat + F.col(p + "intercept")
    return fitted.withColumns(
        {p + "y_hat": yhat, p + "resid": F.col(y) - yhat}
    )
