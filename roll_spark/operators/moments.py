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
from roll_spark.operators.window_ops import QUANTILE_NATIVE_MAX_WIDTH, _spec


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
    out_jb: str | None = None,
) -> DataFrame:
    """Fused skew + kurt: the central-moment sweep runs once and both
    stats read from the same __m2/__m3/__m4 columns — still one
    Exchange + Sort + 2 WindowExec, vs 2x everything for two calls.

    ``out_jb`` additionally emits the Jarque-Bera normality statistic
    JB = n/6 * (g1^2 + g2^2/4) over the window (g1/g2 the UNcorrected
    sample moments, the standard JB definition) — a free projection
    over the same central-moment columns; NULL under the kurtosis
    gates (n < 4 or zero variance)."""
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
    outs = {out_skew: gate(spec, v, skew, n_obs), out_kurt: gate(spec, v, kurt, n_obs)}
    if out_jb is not None:
        jb = F.when(
            (n >= 4) & (m2 > F.lit(EPS)),
            n / 6 * (g1 * g1 + g2 * g2 / 4),
        )
        outs[out_jb] = gate(spec, v, jb, n_obs)
    return df.withColumns(outs).drop(*_MOM_TMP)


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
    shuffle beyond the one hash exchange every window op pays.  The
    collect_list form holds a width-long array per row in JVM heap, so
    widths above QUANTILE_NATIVE_MAX_WIDTH route to the blocked Arrow
    kernel (kernels.conv_nunique), same dispatch rule as roll_quantile.
    """
    spec = _spec(width, min_obs, complete_obs, na_restore, None)
    if width > QUANTILE_NATIVE_MAX_WIDTH:
        from roll_spark.operators import kernels as K
        from roll_spark.operators.arrow_ops import _one

        res = _one(df, value, by, order, spec, K.conv_nunique, out)
        o = F.col(out)
        return res.withColumn(
            out, F.when(o.isNotNull() & ~F.isnan(o), o.cast("int"))
        )
    w = rolling_window(by, order, width)
    v = F.col(value)
    n_obs = F.count(v).over(w)
    stat = F.size(F.array_distinct(F.collect_list(v).over(w))).cast("int")
    return df.withColumn(out, gate(spec, v, stat, n_obs))


def roll_acf(
    df: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    lags: "Sequence[int]" = (1, 2, 3),
    *,
    min_obs: int | None = None,
    na_restore: bool = False,
    out_prefix: str = "acf_",
    out_q: str | None = None,
) -> DataFrame:
    """Fused rolling autocorrelation function: cor(x_t, x_{t-j}) over the
    trailing width-window for EVERY lag j in ``lags``, in one pass —
    seasonality / self-similarity detection on transcript series
    (turn-latency periodicity, burst echo).

    Plan shape: ONE Exchange + ONE Sort + TWO WindowExec nodes total —
    one offset node computing every lag column, one frame node computing
    every lag's pairwise-complete moment set (all lags' aggregates share
    the sliding frame, so Catalyst keeps them in a single node). k
    separate roll_cor calls would cost 2k Window nodes (interleaved
    Projects defeat CollapseWindow).

    Per-lag semantics are EXACTLY roll_cor(x, lag_j(x)) on the reference
    gates (pairwise-complete mask, eps on the centered sums of squares,
    n_obs > 1, min_obs): column j of this fused op is bit-identical to
    the sequential composition (tests/test_moments.py asserts it).

    ``out_q`` additionally emits the Ljung-Box portmanteau statistic
    Q = n(n+2) * sum_j acf_j^2 / (n - j) over the window (n = the
    window's observed count) — the standard "is there ANY
    autocorrelation" test score, a pure projection over the fused
    columns (zero extra window work); NULL when any acf_j is NULL or
    n <= max(lags).
    """
    from roll_spark.operators.base import ordered_window
    from roll_spark.operators.window_ops import QUANTILE_NATIVE_MAX_WIDTH, _spec

    spec = _spec(width, min_obs, True, na_restore, None)
    lags = list(lags)
    ow = ordered_window(by, order)
    w = rolling_window(by, order, width)
    v = F.col(value)
    # 1: all lag columns in one withColumns -> ONE offset WindowExec
    df = df.withColumns({f"__lag{j}": F.lag(v, j).over(ow) for j in lags})
    # 2: all frame aggregates in one withColumns -> ONE frame WindowExec
    aggs = {}
    for j in lags:
        y = F.col(f"__lag{j}")
        both = v.isNotNull() & y.isNotNull()
        xm, ym = F.when(both, v), F.when(both, y)
        aggs[f"__n{j}"] = F.count(F.when(both, F.lit(1))).over(w)
        aggs["__n0"] = F.count(v).over(w)
        aggs[f"__cov{j}"] = F.covar_samp(xm, ym).over(w)
        aggs[f"__sdx{j}"] = F.stddev_samp(xm).over(w)
        aggs[f"__sdy{j}"] = F.stddev_samp(ym).over(w)
    df = df.withColumns(aggs)
    # 3: gated correlations in the projection (division OUTSIDE the
    # window aggregate — ANSI-safe, see roll_cor)
    outs, tmps = {}, []
    for j in lags:
        n_obs = F.col(f"__n{j}")
        ssx = F.col(f"__sdx{j}") * F.col(f"__sdx{j}") * (n_obs - 1)
        ssy = F.col(f"__sdy{j}") * F.col(f"__sdy{j}") * (n_obs - 1)
        stat = F.when(
            (ssx > F.lit(EPS)) & (ssy > F.lit(EPS)),
            F.col(f"__cov{j}") / (F.col(f"__sdx{j}") * F.col(f"__sdy{j}")),
        )
        restore_ref = F.when(
            v.isNull() | F.col(f"__lag{j}").isNull(), F.lit(None)
        ).otherwise(F.lit(1.0))
        outs[f"{out_prefix}{j}"] = gate(spec, restore_ref, stat, n_obs, need_two=True)
        tmps += [f"__lag{j}", f"__n{j}", f"__cov{j}", f"__sdx{j}", f"__sdy{j}"]
    df = df.withColumns(outs)
    if out_q is not None:
        n0 = F.col("__n0").cast("double")
        q = None
        for j in lags:
            a = F.col(f"{out_prefix}{j}")
            term = a * a / (n0 - j)
            q = term if q is None else q + term
        df = df.withColumn(
            out_q, F.when(n0 > max(lags), n0 * (n0 + 2) * q)
        )
    return df.drop(*tmps, "__n0")


@complete_obs_maskable
def roll_percentrank(
    df: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    min_obs: int | None = None,
    complete_obs: bool = False,
    na_restore: bool = False,
    out: str = "roll_percentrank",
) -> DataFrame:
    """Rolling percent rank of the CURRENT value within its trailing
    window: (#{observed v <= x_t} - 1) / (n_obs - 1), in [0, 1] — a
    distribution-free "how extreme is this turn" score.  Tie convention
    is MAX-rank (counts v <= x), so tied values all score at the top of
    their tie group; SQL PERCENT_RANK uses min-rank (#{v < x}).  All
    three paths (native HOF, Arrow kernel, DuckDB oracle) share the
    max-rank convention.

    collect_list + a JVM higher-order filter; NULL when the current
    value is missing or n_obs < max(min_obs, 2). Widths above
    QUANTILE_NATIVE_MAX_WIDTH route to the blocked Arrow kernel
    (kernels.conv_percentrank) — fixed memory budget at any width.
    """
    spec = _spec(width, min_obs, complete_obs, na_restore, None)
    if width > QUANTILE_NATIVE_MAX_WIDTH:
        from roll_spark.operators import kernels as K
        from roll_spark.operators.arrow_ops import _one

        return _one(df, value, by, order, spec, K.conv_percentrank, out)
    w = rolling_window(by, order, width)
    v = F.col(value)
    n_obs = F.count(v).over(w)
    arr = F.collect_list(v).over(w)
    le = F.size(F.filter(arr, lambda e: e <= v))
    stat = F.when(
        v.isNotNull() & (n_obs >= 2),
        (le - F.lit(1)).cast("double") / (n_obs - F.lit(1)),
    )
    return df.withColumn(out, gate(spec, v, stat, n_obs, need_two=True))


@complete_obs_maskable
def roll_trimmed_mean(
    df: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    alpha: float = 0.2,
    *,
    min_obs: int | None = None,
    complete_obs: bool = False,
    na_restore: bool = False,
    out: str = "roll_trimmed_mean",
) -> DataFrame:
    """Rolling trimmed mean: drop floor(alpha * n_obs) observed values
    from EACH end of the sorted window, average the rest — the standard
    robust location estimate for heavy-tailed telemetry (latency
    spikes) that roll_mean smears and roll_median over-discards.

    alpha in [0, 0.5): at least one value always survives, so the only
    NULL gates are min_obs / na_restore. The trim count uses the same
    float64 ``floor(alpha * n)`` on every path (native, Arrow kernel,
    DuckDB oracle), so boundary fills agree bit-for-bit.

    Native path (collect_list + array_sort + slice + aggregate, all JVM
    higher-order functions) holds a width-long array per row, so widths
    above QUANTILE_NATIVE_MAX_WIDTH dispatch to the blocked Arrow
    kernel (kernels.conv_trimmed_mean) — the roll_quantile rule.
    """
    if not 0.0 <= alpha < 0.5:
        raise ValueError(f"alpha must be in [0, 0.5), got {alpha}")
    spec = _spec(width, min_obs, complete_obs, na_restore, None)
    if width > QUANTILE_NATIVE_MAX_WIDTH:
        from roll_spark.operators import kernels as K
        from roll_spark.operators.arrow_ops import _one

        return _one(df, value, by, order, spec, K.conv_trimmed_mean, out,
                    alpha=alpha)
    w = rolling_window(by, order, width)
    v = F.col(value)
    arr = F.array_sort(F.collect_list(v).over(w))
    n = F.size(arr)
    k = F.floor(F.lit(float(alpha)) * n).cast("int")
    m = n - 2 * k
    total = F.aggregate(
        F.slice(arr, k + 1, m), F.lit(0.0), lambda acc, e: acc + e
    )
    stat = total / m
    return df.withColumn(out, gate(spec, v, stat, n))


SPEARMAN_NATIVE_MAX_WIDTH = 64  # O(w^2) HOF rank counts per row


def roll_spearman(
    df: DataFrame,
    x: str,
    y: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    min_obs: int | None = None,
    na_restore: bool = False,
    out: str = "roll_spearman",
) -> DataFrame:
    """Rolling Spearman rank correlation (pairwise-complete, exact
    average-rank ties) — the robust twin of roll_cor: invariant to any
    monotone transform of either series, which is what heavy-tailed
    transcript telemetry (latency vs length) actually calls for.

    Mid-rank of e among window values v: (#{v<e} + #{v<=e} + 1)/2, then
    Pearson over the ranks with centered two-pass sums — mid-ranks are
    half-integers so their sums are EXACT in float64 and a
    tie-degenerate window hits the ssx > 0 gate identically on every
    path (native HOF, Arrow kernel, DuckDB oracle).

    Native path builds paired rank arrays with JVM higher-order
    functions: O(w^2) comparisons per row, so widths above
    SPEARMAN_NATIVE_MAX_WIDTH dispatch to the Arrow kernel
    (kernels.conv_spearman: one argsort + one global reduceat per
    block, O(w log w) per row). Each array stage is materialized as its
    own projected column — inlining them re-evaluates the producing
    expression per element (O(w^3)/row; CollapseProject only spares
    multi-referenced aliases it deems non-cheap).
    """
    spec = _spec(width, min_obs, True, na_restore, None)
    if width > SPEARMAN_NATIVE_MAX_WIDTH:
        from roll_spark.operators import kernels as K
        from roll_spark.operators.arrow_ops import _two

        return _two(df, x, y, by, order, spec, K.conv_spearman, out)
    w = rolling_window(by, order, width)
    xv, yv = F.col(x), F.col(y)
    both = xv.isNotNull() & yv.isNotNull()
    df = df.withColumn(
        "__sp_pairs",
        F.collect_list(F.when(both, F.struct(xv.alias("a"), yv.alias("b")))).over(w),
    )
    pairs = F.col("__sp_pairs")
    n = F.size(pairs)

    def _ranks(field):
        return F.transform(
            pairs,
            lambda p: (
                F.size(F.filter(pairs, lambda q: q[field] < p[field]))
                + F.size(F.filter(pairs, lambda q: q[field] <= p[field]))
                + F.lit(1)
            ).cast("double")
            / F.lit(2.0),
        )

    df = df.withColumn("__sp_rx", _ranks("a")).withColumn("__sp_ry", _ranks("b"))
    rx, ry = F.col("__sp_rx"), F.col("__sp_ry")
    zero = F.lit(0.0)
    # n can be 0 (no complete pair in the window): guard the division —
    # ANSI mode makes x/0 a runtime error, and these are unconditional
    # projections (the CASE gate only protects the final stat)
    df = df.withColumn(
        "__sp_mrx", F.when(n > 0, F.aggregate(rx, zero, lambda acc, e: acc + e) / n)
    ).withColumn(
        "__sp_mry", F.when(n > 0, F.aggregate(ry, zero, lambda acc, e: acc + e) / n)
    )
    mrx, mry = F.col("__sp_mrx"), F.col("__sp_mry")
    ssx = F.aggregate(rx, zero, lambda acc, e: acc + (e - mrx) * (e - mrx))
    ssy = F.aggregate(ry, zero, lambda acc, e: acc + (e - mry) * (e - mry))
    sxy = F.aggregate(
        F.zip_with(rx, ry, lambda a, b: (a - mrx) * (b - mry)),
        zero,
        lambda acc, e: acc + e,
    )
    df = df.withColumns({"__sp_ssx": ssx, "__sp_ssy": ssy, "__sp_sxy": sxy})
    stat = F.when(
        (F.col("__sp_ssx") > 0) & (F.col("__sp_ssy") > 0),
        F.col("__sp_sxy") / F.sqrt(F.col("__sp_ssx") * F.col("__sp_ssy")),
    )
    restore_ref = F.when(xv.isNull() | yv.isNull(), F.lit(None)).otherwise(F.lit(1.0))
    res = df.withColumn(out, gate(spec, restore_ref, stat, n, need_two=True))
    return res.drop("__sp_pairs", "__sp_rx", "__sp_ry", "__sp_mrx", "__sp_mry",
                    "__sp_ssx", "__sp_ssy", "__sp_sxy")


ENTROPY_NATIVE_MAX_WIDTH = 64  # O(w^2) HOF equality counts per row


def roll_entropy(
    df: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    min_obs: int | None = None,
    na_restore: bool = False,
    out: str = "roll_entropy",
) -> DataFrame:
    """Rolling empirical Shannon entropy (natural log) of the exact
    values in the trailing window — the behavioral-diversity signal for
    transcript streams: an agent stuck re-issuing the same tool call
    drives the entropy of its event/tool types toward 0, while varied
    behavior approaches ln(#distinct).

    Works on ANY orderable column type (strings included): the native
    path counts equal values with JVM higher-order functions,
    H = -(1/n) * sum_e ln(#{v == e} / n) (summing per ELEMENT equals
    the per-distinct-value form). Widths above
    ENTROPY_NATIVE_MAX_WIDTH dispatch to the Arrow kernel
    (kernels.conv_entropy) with a pandas factorize per batch.
    """
    spec = _spec(width, min_obs, False, na_restore, None)
    if width > ENTROPY_NATIVE_MAX_WIDTH:
        from roll_spark.operators import kernels as K
        from roll_spark.operators.arrow_ops import _apply_kernel

        def kernel(pdf):
            import pandas as pd

            codes, _ = pd.factorize(pdf[value], use_na_sentinel=True)
            x = codes.astype("float64")
            x[codes < 0] = float("nan")
            return {out: K.conv_entropy(x, width,
                                        min_obs=spec.effective_min_obs,
                                        na_restore=na_restore)}

        return _apply_kernel(df, [value], by, order, [(out, "double")],
                             kernel, spec=spec)
    w = rolling_window(by, order, width)
    v = F.col(value)
    df = df.withColumn("__ent_l", F.collect_list(v).over(w))
    l = F.col("__ent_l")
    n = F.size(l)
    terms = F.transform(
        l,
        lambda e: F.log(
            F.size(F.filter(l, lambda q: q == e)).cast("double") / n
        ),
    )
    h = F.when(
        n > 0,
        -F.aggregate(terms, F.lit(0.0), lambda acc, e: acc + e) / n,
    )
    n_obs = F.count(v).over(w)
    return df.withColumn(out, gate(spec, v, h, n_obs)).drop("__ent_l")


def roll_iqr(
    df: DataFrame,
    value: str,
    by: Cols,
    order: Cols,
    width: int,
    *,
    min_obs: int | None = None,
    weights: "Sequence[float] | None" = None,
    out: str = "iqr",
) -> DataFrame:
    """Rolling interquartile range (exact HF2 q75 - q25) — the robust
    scale twin of roll_sd (MAD's rank-based sibling), at the cost of
    ONE sorted window per row: both quartiles come off the fused
    roll_quantiles table lookup, so this is exactly as expensive as a
    single rolling median (same single WindowExec / one Arrow pass).
    """
    from roll_spark.operators.window_ops import roll_quantiles

    q = roll_quantiles(
        df, value, by, order, width, (0.25, 0.75),
        min_obs=min_obs, weights=weights,
        outs=("__iqr_q25", "__iqr_q75"),
    )
    return (
        q.withColumn(out, F.col("__iqr_q75") - F.col("__iqr_q25"))
        .drop("__iqr_q25", "__iqr_q75")
    )
