"""Higher-moment and cardinality rolling ops on the native Catalyst path.

These extend the reference surface (jasonjfoster/roll has mean/var/sd as
its highest moments — roll_vec.h:2114) with the third/fourth standardized
moments and rolling distinct counts that a transcript-analytics tier
needs (burstiness / heavy-tail detection on latency + value series).

Numerical strategy for skew/kurt: power sums of the RAW values lose
~(mean/sd)^k digits to cancellation, so both stats are computed from
power sums of per-series CENTERED values d = x - avg(x over series).
Central moments are mathematically shift-invariant, so the series mean
does not need to be exact — it only needs to sit near the data to kill
the cancellation — and the whole thing stays a single Exchange + Sort
with two WindowExec nodes (one unbounded per-series avg, one sliding
frame of four power sums that Catalyst collapses into a single node).

Definitions (bias-corrected sample forms, identical to DuckDB / pandas
/ Excel SKEW + KURT):

    G1 = g1 * sqrt(n(n-1)) / (n-2),          g1 = (M3/n) / (M2/n)^1.5
    G2 = ((n+1)*g2 + 6) * (n-1)/((n-2)(n-3)), g2 = n*M4/M2^2 - 3

NULL gates: n_obs < 3 (skew) / < 4 (kurt), or M2 <= eps (constant
window), plus the engine-wide min_obs / na_restore gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from roll_spark.config import EPS
from roll_spark.operators.base import (
    Cols,
    _as_list,
    complete_obs_maskable,
    gate,
    rolling_window,
)
from roll_spark.operators.window_ops import _spec


def _central_moments(df, value, by, order, width):
    """Append __n/__m2/__m3/__m4 columns (sliding central moments).

    One withColumns call so the four power sums + count share a single
    WindowExec; the per-series centering avg is a second WindowExec on
    the same partitioning (no extra exchange or sort).
    """
    # unbounded frame but SAME (partition, order) as the sliding window,
    # so Catalyst reuses one Exchange + one Sort for both WindowExecs
    w_part = (
        Window.partitionBy(*_as_list(by))
        .orderBy(*_as_list(order))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = rolling_window(by, order, width)
    df = df.withColumn("__c", F.avg(F.col(value)).over(w_part))
    d = F.col(value) - F.col("__c")
    df = df.withColumns(
        {
            "__n": F.count(d).over(w).cast("double"),
            # the min_obs gate's count rides the SAME WindowExec — a
            # later F.count(value).over(w) would sit behind the moment
            # Project and CollapseWindow could no longer merge it
            "__nobs": F.count(F.col(value)).over(w),
            "__s1": F.sum(d).over(w),
            "__s2": F.sum(d * d).over(w),
            "__s3": F.sum(d * d * d).over(w),
            "__s4": F.sum(d * d * d * d).over(w),
        }
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("__n", "__s1", "__s2", "__s3", "__s4"))
    m = s1 / n
    df = df.withColumns(
        {
            "__m2": s2 - s1 * s1 / n,
            "__m3": s3 - 3 * m * s2 + 2 * n * m * m * m,
            "__m4": s4 - 4 * m * s3 + 6 * m * m * s2 - 3 * n * m * m * m * m,
        }
    )
    return df


_MOM_TMP = ["__c", "__n", "__nobs", "__s1", "__s2", "__s3", "__s4", "__m2", "__m3", "__m4"]


@complete_obs_maskable
def roll_skew(
    df: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    min_obs: int | None = None,
    complete_obs: bool = False,
    na_restore: bool = False,
    out: str = "roll_skew",
) -> DataFrame:
    """Bias-corrected rolling sample skewness (G1)."""
    spec = _spec(width, min_obs, complete_obs, na_restore, None)
    df = _central_moments(df, value, by, order, width)
    n, m2, m3 = F.col("__n"), F.col("__m2"), F.col("__m3")
    g1 = m3 * F.sqrt(n) / F.pow(m2, F.lit(1.5))
    stat = F.when(
        (n >= 3) & (m2 > F.lit(EPS)),
        g1 * F.sqrt(n * (n - 1)) / (n - 2),
    )
    n_obs = F.col("__nobs")
    return df.withColumn(out, gate(spec, F.col(value), stat, n_obs)).drop(*_MOM_TMP)


@complete_obs_maskable
def roll_kurt(
    df: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    min_obs: int | None = None,
    complete_obs: bool = False,
    na_restore: bool = False,
    out: str = "roll_kurt",
) -> DataFrame:
    """Bias-corrected rolling excess kurtosis (G2)."""
    spec = _spec(width, min_obs, complete_obs, na_restore, None)
    df = _central_moments(df, value, by, order, width)
    n, m2, m4 = F.col("__n"), F.col("__m2"), F.col("__m4")
    g2 = n * m4 / (m2 * m2) - 3
    stat = F.when(
        (n >= 4) & (m2 > F.lit(EPS)),
        ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3)),
    )
    n_obs = F.col("__nobs")
    return df.withColumn(out, gate(spec, F.col(value), stat, n_obs)).drop(*_MOM_TMP)


@complete_obs_maskable
def roll_skew_kurt(
    df: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    min_obs: int | None = None,
    complete_obs: bool = False,
    na_restore: bool = False,
    out_skew: str = "roll_skew",
    out_kurt: str = "roll_kurt",
) -> DataFrame:
    """Fused skew + kurt: the central-moment sweep runs once and both
    stats read from the same __m2/__m3/__m4 columns — still one
    Exchange + Sort + 2 WindowExec, vs 2x everything for two calls."""
    spec = _spec(width, min_obs, complete_obs, na_restore, None)
    df = _central_moments(df, value, by, order, width)
    n, m2, m3, m4 = (F.col(c) for c in ("__n", "__m2", "__m3", "__m4"))
    g1 = m3 * F.sqrt(n) / F.pow(m2, F.lit(1.5))
    g2 = n * m4 / (m2 * m2) - 3
    n_obs = F.col("__nobs")
    v = F.col(value)
    skew = F.when((n >= 3) & (m2 > F.lit(EPS)), g1 * F.sqrt(n * (n - 1)) / (n - 2))
    kurt = F.when(
        (n >= 4) & (m2 > F.lit(EPS)),
        ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3)),
    )
    return df.withColumns(
        {out_skew: gate(spec, v, skew, n_obs), out_kurt: gate(spec, v, kurt, n_obs)}
    ).drop(*_MOM_TMP)


@complete_obs_maskable
def roll_nunique(
    df: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    min_obs: int | None = None,
    complete_obs: bool = False,
    na_restore: bool = False,
    out: str = "roll_nunique",
) -> DataFrame:
    """Rolling distinct-value count over the trailing window.

    collect_list drops NULLs (matching the engine-wide observed-values
    convention), array_distinct dedups JVM-side — no Python, no extra
    shuffle beyond the one hash exchange every window op pays.  Width
    is bounded (window semantics), so the per-row array is bounded; for
    unbounded distinct counts use a tier aggregation, not a window.
    """
    spec = _spec(width, min_obs, complete_obs, na_restore, None)
    w = rolling_window(by, order, width)
    v = F.col(value)
    n_obs = F.count(v).over(w)
    stat = F.size(F.array_distinct(F.collect_list(v).over(w))).cast("int")
    return df.withColumn(out, gate(spec, v, stat, n_obs))
