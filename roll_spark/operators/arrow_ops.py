"""Arrow (applyInPandas) execution of the roll_* surface — the scale
path for weighted / exponential-decay inputs, exact quantiles at large
widths, and k-regressor roll_lm.

Physical shape: one hash exchange on the series key, then a grouped-map
Pandas UDF per series running the vectorized numpy kernels of
roll_spark.operators.kernels — exactly the reference's parallelization
model (one task per independent series, sequential in time;
src/roll.cpp:384) with Arrow batches instead of RcppParallel threads.
Per-row Python never happens: each group crosses the JVM<->Python
boundary once as a columnar batch.

Skewed series (one conversation with 10^9 turns) do NOT fit this model;
they go through roll_spark.operators.chunked which splits a series into
overlap-padded chunks that this module's kernels evaluate independently.

DATA CONTRACT (all roll_* entry points, both paths): the (by, order)
key tuple — e.g. (conv_id, turn_idx) / (user_id, ts) — must be UNIQUE
and NON-NULL per row. The wide-frame join-back rejoins kernel outputs
on exactly these keys: a NULL order key never matches (its outputs
silently become NULL) and duplicate keys fan out. Set
ROLL_SPARK_DEBUG_KEYS=1 to fail loudly instead: the join-back then
asserts key uniqueness/non-nullness per group before joining.
"""

from __future__ import annotations

import os

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as TT

from roll_spark.config import RollSpec
from roll_spark.operators import kernels as K
from roll_spark.operators.base import Cols, _as_list

_WIDE_TYPES = (TT.StringType, TT.BinaryType)


def _nan_to_none_rows(mat):
    """(n, k) float matrix -> list of array<double> cells (all-NaN row
    -> NULL array, NaN element -> NULL element)."""
    return [
        None if np.isnan(row).all()
        else [None if np.isnan(v) else float(v) for v in row]
        for row in mat
    ]


def _apply_kernel(
    df: DataFrame,
    in_cols: list[str],
    by: Cols,
    order: Cols,
    out_fields: list[tuple[str, str]],
    kernel,
    spec: RollSpec | None = None,
) -> DataFrame:
    """Run ``kernel(pdf) -> dict[out_col, np.ndarray]`` per series group.

    Skew auto-dispatch: when ``spec.max_group_rows`` is set, EVERY
    series is routed through the overlap-padded chunk layout
    (operators.chunked) with that bound as the chunk size — a series
    at or under the bound lands entirely in chunk 0 with zero pad rows
    (only its grouping key widens), while a 10^9-turn conversation
    becomes ceil(n / bound) independent tasks whose padded windows
    reproduce the unchunked outputs exactly. The cost of the guard is
    one extra row_number window pass + grouping on (series, chunk)
    instead of (series).

    Two physical strategies:

    - PASSTHROUGH (narrow frames): every column rides through the Arrow
      batch and the UDF appends the outputs — ONE shuffle (the groupBy),
      no join. Chosen when no non-key column is a string/binary wider
      than the keys (typical derived-series frames).
    - JOIN-BACK (wide frames, e.g. raw transcripts with full text):
      only (keys, order, inputs) cross the Python boundary; results join
      back on the (by, order) key columns so megabyte text/binary
      payloads never serialize through Arrow twice. This relies on the
      engine's data contract — (series key, order key) uniquely
      identifies a row, e.g. (conv_id, turn_idx) — and is deterministic
      under recomputation, unlike a synthetic monotonically_increasing_id
      (whose values are partition-layout-dependent: the two sides of the
      self-join may recompute the upstream plan with different physical
      layouts and disagree on every id).
    """
    if spec is not None and spec.max_group_rows is not None:
        from roll_spark.operators.chunked import chunk_pad, drop_pads

        padded, keys = chunk_pad(df, by, order, spec.width, spec.max_group_rows)
        return drop_pads(
            _apply_kernel(padded, in_cols, keys, order, out_fields, kernel)
        )
    by_l, order_l = _as_list(by), _as_list(order)
    key_cols = set(by_l) | set(order_l) | set(in_cols)
    wide = [
        f.name
        for f in df.schema
        if f.name not in key_cols and isinstance(f.dataType, _WIDE_TYPES)
    ]
    order_cols = list(order_l)

    if not wide:
        out_schema = TT.StructType(
            list(df.schema)
            + [TT.StructField(n, TT._parse_datatype_string(t)) for n, t in out_fields]
        )

        def fn_pass(pdf):
            import pandas as pd

            pdf = pdf.sort_values(order_cols, kind="stable")
            res = kernel(pdf)
            return pdf.assign(**res)

        return df.groupBy(*by_l).applyInPandas(fn_pass, schema=out_schema)

    field_by_name = {f.name: f for f in df.schema}
    slim = df.select(*by_l, *order_l, *in_cols)
    out_schema = TT.StructType(
        [field_by_name[c] for c in by_l + order_l]
        + [TT.StructField(n, TT._parse_datatype_string(t)) for n, t in out_fields]
    )

    debug_keys = os.environ.get("ROLL_SPARK_DEBUG_KEYS") == "1"

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="stable")
        if debug_keys:
            keys = pdf[order_cols]
            if keys.isna().any().any():
                raise ValueError(
                    "roll_spark data contract violated: NULL order key in "
                    f"series group (order cols {order_cols}); NULL keys "
                    "never match the join-back and would silently NULL "
                    "their kernel outputs"
                )
            if keys.duplicated().any():
                raise ValueError(
                    "roll_spark data contract violated: duplicate "
                    f"(by, order) key in series group (order cols "
                    f"{order_cols}); duplicates fan out in the join-back"
                )
        res = kernel(pdf)
        data = {c: pdf[c].to_numpy() for c in by_l + order_l}
        data.update(res)
        return pd.DataFrame(data)

    res = slim.groupBy(*by_l).applyInPandas(fn, schema=out_schema)
    return df.join(res, on=by_l + order_l, how="left")


def _series_kernel_1(value: str, spec: RollSpec, fn, out: str, **kw):
    weights = None if spec.weights is None else np.asarray(spec.weights)

    def kernel(pdf):
        x = pdf[value].to_numpy(dtype=np.float64, na_value=np.nan)
        arr = fn(
            x,
            spec.width,
            weights=weights,
            min_obs=spec.effective_min_obs,
            na_restore=spec.na_restore,
            **kw,
        )
        return {out: arr}

    return kernel


def _series_kernel_2(x_col: str, y_col: str, spec: RollSpec, fn, out: str, **kw):
    weights = None if spec.weights is None else np.asarray(spec.weights)

    def kernel(pdf):
        x = pdf[x_col].to_numpy(dtype=np.float64, na_value=np.nan)
        y = pdf[y_col].to_numpy(dtype=np.float64, na_value=np.nan)
        arr = fn(
            x, y,
            spec.width,
            weights=weights,
            min_obs=spec.effective_min_obs,
            na_restore=spec.na_restore,
            **kw,
        )
        return {out: arr}

    return kernel


def _one(df, value, by, order, spec, fn, out, **kw):
    return _apply_kernel(
        df, [value], by, order, [(out, "double")],
        _series_kernel_1(value, spec, fn, out, **kw), spec=spec,
    )


def _two(df, x, y, by, order, spec, fn, out, **kw):
    return _apply_kernel(
        df, [x, y], by, order, [(out, "double")],
        _series_kernel_2(x, y, spec, fn, out, **kw), spec=spec,
    )


def roll_sum(df, value, by, order, spec: RollSpec, *, out="roll_sum"):
    return _one(df, value, by, order, spec, K.conv_sum, out)


def roll_mean(df, value, by, order, spec: RollSpec, *, out="roll_mean"):
    return _one(df, value, by, order, spec, K.conv_mean, out)


def roll_prod(df, value, by, order, spec: RollSpec, *, out="roll_prod"):
    return _one(df, value, by, order, spec, K.conv_prod, out)


def roll_var(df, value, by, order, spec: RollSpec, *, out="roll_var"):
    return _one(df, value, by, order, spec, K.conv_var, out, center=spec.center)


def roll_sd(df, value, by, order, spec: RollSpec, *, out="roll_sd"):
    return _one(df, value, by, order, spec, K.conv_sd, out, center=spec.center)


def roll_quantile(df, value, by, order, spec: RollSpec, *, out="roll_quantile"):
    return _one(df, value, by, order, spec, K.conv_quantile, out, p=spec.p)


def roll_quantiles(df, value, by, order, spec: RollSpec, ps, outs):
    """Fused multi-p quantile: ONE grouped-map pass, one shared
    sort/partition per window block (K.conv_quantiles), one output
    column per probability."""
    weights = None if spec.weights is None else np.asarray(spec.weights)
    ps = list(ps)

    def kernel(pdf):
        x = pdf[value].to_numpy(dtype=np.float64, na_value=np.nan)
        arr = K.conv_quantiles(
            x, spec.width, ps, weights=weights,
            min_obs=spec.effective_min_obs, na_restore=spec.na_restore,
        )
        return {o: arr[:, j] for j, o in enumerate(outs)}

    return _apply_kernel(
        df, [value], by, order, [(o, "double") for o in outs], kernel, spec=spec
    )


def roll_scale(df, value, by, order, spec: RollSpec, *, out="roll_scale"):
    # scale = (x_last - mean) / sd with the reference gates (most recent
    # non-NA in the window; roll_vec.h:3132-3143), composed from the
    # shared WindowSums convolutions
    def scale_fn(x, width, weights=None, min_obs=None, na_restore=False):
        x = np.asarray(x, dtype=np.float64)
        min_obs = width if min_obs is None else min_obs
        ok = ~np.isnan(x)
        # most recent non-NA in the trailing window
        idx = np.arange(len(x))
        last_idx = np.where(ok, idx, -1)
        last_idx = np.maximum.accumulate(last_idx)
        # invalidate when the last non-NA fell out of the window
        valid_last = last_idx >= idx - width + 1
        x_last = np.where(valid_last & (last_idx >= 0), x[np.maximum(last_idx, 0)], np.nan)
        s = K.WindowSums(x, width, weights)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s.sum_wx / s.sum_w
            centered = x_last - mean if spec.center else x_last
            if spec.scale:
                if spec.center:
                    # exact two-pass centered sum of squares (no
                    # cancellation; see kernels._pair_window_moments)
                    n_obs, sum_w, sumsq_w, ss, _, _, _, _ = K._pair_window_moments(
                        x, None, width, weights
                    )
                else:
                    n_obs, sum_w, sumsq_w, ss = (
                        s.n_obs, s.sum_w, s.sumsq_w(), s.sum_wx2()
                    )
                v = ss / (sum_w - sumsq_w / sum_w)
                res = np.where(
                    (s.n_obs > 1) & (v > K.EPS), centered / np.sqrt(v), np.nan
                )
            else:
                res = centered
            out_arr = np.where(s.n_obs >= min_obs, res, np.nan)
        return K._restore(out_arr, x, na_restore)

    return _one(df, value, by, order, spec, scale_fn, out)


def roll_cov(df, x, by, order, spec: RollSpec, *, y, out="roll_cov"):
    return _two(df, x, y, by, order, spec, K.conv_cov, out, center=spec.center)


def roll_cor(df, x, by, order, spec: RollSpec, *, y, out="roll_cor"):
    return _two(df, x, y, by, order, spec, K.conv_cor, out)


def roll_crossprod(df, x, by, order, spec: RollSpec, *, y, out="roll_crossprod"):
    return _two(df, x, y, by, order, spec, K.conv_crossprod, out)


def roll_lm(df, x, y, by, order, spec: RollSpec, *, intercept=True, out_prefix="lm_"):
    """Weighted single-regressor lm via the k-kernel (k=1)."""
    return roll_lm_k(df, [x], y, by, order, spec, intercept=intercept,
                     out_prefix=out_prefix, flat=True)


def roll_lm_k(
    df: DataFrame,
    x_cols: Sequence[str],
    y: str,
    by: Cols,
    order: Cols,
    spec: RollSpec,
    *,
    intercept: bool = True,
    out_prefix: str = "lm_",
    flat: bool = False,
) -> DataFrame:
    """k-regressor rolling OLS: rolling XtX/Xty + batched np.linalg.solve
    (the reference's two-phase roll_lm, src/roll.cpp:2069-2117).

    Output: ``{p}coef array<double>, {p}intercept, {p}r2, {p}se
    array<double>, {p}se_intercept`` — or flat scalar columns matching
    the native path when ``flat=True`` (k must be 1).
    """
    weights = None if spec.weights is None else np.asarray(spec.weights)
    x_cols = list(x_cols)
    p = out_prefix

    fields = [
        (p + "coef", "array<double>"),
        (p + "r2", "double"),
        (p + "se", "array<double>"),
    ]
    if intercept:
        fields += [(p + "intercept", "double"), (p + "se_intercept", "double")]

    def kernel(pdf):
        X = np.column_stack(
            [pdf[c].to_numpy(dtype=np.float64, na_value=np.nan) for c in x_cols]
        )
        yv = pdf[y].to_numpy(dtype=np.float64, na_value=np.nan)
        res = K.conv_lm_k(
            X, yv, spec.width, weights=weights,
            min_obs=spec.effective_min_obs, intercept=intercept,
        )
        out = {
            p + "coef": _nan_to_none_rows(res["coef"]),
            p + "r2": res["r2"],
            p + "se": _nan_to_none_rows(res["se"]),
        }
        if intercept:
            out[p + "intercept"] = res["intercept"]
            out[p + "se_intercept"] = res["se_intercept"]
        return out

    res = _apply_kernel(df, x_cols + [y], by, order, fields, kernel, spec=spec)
    if flat:
        if len(x_cols) != 1:
            raise ValueError("flat=True requires exactly one regressor")
        res = (
            res.withColumn(p + "coef_x", F.col(p + "coef")[0])
            .withColumn(p + "se_x", F.col(p + "se")[0])
            .drop(p + "coef", p + "se")
        )
    return res


def roll_lm_multi(
    df: DataFrame,
    x_cols: Sequence[str],
    y_cols: Sequence[str],
    by: Cols,
    order: Cols,
    spec: RollSpec,
    *,
    intercept: bool = True,
    out_prefix: str = "lm_",
) -> DataFrame:
    """Multi-response rolling OLS: one INDEPENDENT fit per y column,
    the reference's z-matrix loop (src/roll.cpp:2280-2325 runs roll_lm
    once per y column and returns a list).

    Each fit applies its own complete-obs mask over (x_cols, that y) —
    exactly what the reference's per-column loop does — but all fits for
    a series run inside ONE grouped-map UDF call, so the Arrow exchange
    and the window materialization cost is paid once, not len(y_cols)
    times. Output columns: ``{prefix}{y}_coef array<double>,
    {prefix}{y}_r2, {prefix}{y}_se array<double>`` (+ ``_intercept``,
    ``_se_intercept`` when intercept=True) per y column.
    """
    weights = None if spec.weights is None else np.asarray(spec.weights)
    x_cols = list(x_cols)
    y_cols = list(y_cols)
    p = out_prefix

    fields = []
    for yc in y_cols:
        fields += [
            (f"{p}{yc}_coef", "array<double>"),
            (f"{p}{yc}_r2", "double"),
            (f"{p}{yc}_se", "array<double>"),
        ]
        if intercept:
            fields += [
                (f"{p}{yc}_intercept", "double"),
                (f"{p}{yc}_se_intercept", "double"),
            ]

    def kernel(pdf):
        X = np.column_stack(
            [pdf[c].to_numpy(dtype=np.float64, na_value=np.nan) for c in x_cols]
        )
        out = {}
        for yc in y_cols:
            yv = pdf[yc].to_numpy(dtype=np.float64, na_value=np.nan)
            res = K.conv_lm_k(
                X, yv, spec.width, weights=weights,
                min_obs=spec.effective_min_obs, intercept=intercept,
            )
            out[f"{p}{yc}_coef"] = _nan_to_none_rows(res["coef"])
            out[f"{p}{yc}_r2"] = res["r2"]
            out[f"{p}{yc}_se"] = _nan_to_none_rows(res["se"])
            if intercept:
                out[f"{p}{yc}_intercept"] = res["intercept"]
                out[f"{p}{yc}_se_intercept"] = res["se_intercept"]
        return out

    return _apply_kernel(df, x_cols + y_cols, by, order, fields, kernel, spec=spec)


def roll_cov_xy_matrix(
    df: DataFrame,
    x_cols: Sequence[str],
    y_cols: Sequence[str],
    by: Cols,
    order: Cols,
    spec: RollSpec,
    *,
    complete_obs: bool = True,
    out: str = "roll_cov_xy",
) -> DataFrame:
    """Rolling k_x x k_y CROSS-covariance cube for an (x, y) matrix pair,
    flattened row-major into ``array<double>`` of length k_x*k_y — the
    reference's non-symmetric cube when roll_cov gets two matrices
    (src/roll.cpp:1661-1679, roll_mat.h:3659). complete_obs=True masks
    rows missing ANY column of either matrix; False computes each cross
    pair over its own pairwise-complete windows."""
    weights = None if spec.weights is None else np.asarray(spec.weights)
    x_cols = list(x_cols)
    y_cols = list(y_cols)

    def kernel(pdf):
        X = np.column_stack(
            [pdf[c].to_numpy(dtype=np.float64, na_value=np.nan) for c in x_cols]
        )
        Y = np.column_stack(
            [pdf[c].to_numpy(dtype=np.float64, na_value=np.nan) for c in y_cols]
        )
        cube = K.conv_cov_xy_matrix(
            X, Y, spec.width, weights=weights, min_obs=spec.effective_min_obs,
            center=spec.center, complete_obs=complete_obs,
        ).reshape(len(X), -1)
        return {out: [[None if np.isnan(v) else float(v) for v in row] for row in cube]}

    return _apply_kernel(df, x_cols + y_cols, by, order, [(out, "array<double>")], kernel, spec=spec)


def roll_cov_matrix(
    df: DataFrame,
    x_cols: Sequence[str],
    by: Cols,
    order: Cols,
    spec: RollSpec,
    *,
    scale: bool = False,
    complete_obs: bool = True,
    out: str = "roll_cov_matrix",
) -> DataFrame:
    """Rolling k x k covariance/correlation matrix per row, flattened
    row-major into ``array<double>`` of length k*k (the reference's cube
    slice per timestamp, inst/include/roll_attr.h:56-70). scale=True
    gives the correlation matrix (reference roll_cor on matrix input).

    ``complete_obs`` is an explicit keyword (not read off the spec)
    because its reference default differs by op: TRUE for matrix
    cov/cor (R/roll.R:712), FALSE elsewhere. complete_obs=False gives
    per-pair pairwise-complete windows (src/roll.cpp:103-155 masks)."""
    weights = None if spec.weights is None else np.asarray(spec.weights)
    x_cols = list(x_cols)

    def kernel(pdf):
        X = np.column_stack(
            [pdf[c].to_numpy(dtype=np.float64, na_value=np.nan) for c in x_cols]
        )
        cube = K.conv_cov_matrix(
            X, spec.width, weights=weights, min_obs=spec.effective_min_obs,
            center=spec.center, scale=scale, complete_obs=complete_obs,
        ).reshape(len(X), -1)
        return {out: [[None if np.isnan(v) else float(v) for v in row] for row in cube]}

    return _apply_kernel(df, x_cols, by, order, [(out, "array<double>")], kernel, spec=spec)


def roll_mad(df, value, by, order, width, *, min_obs=None, na_restore=False,
             max_group_rows=None, out="roll_mad"):
    """Rolling median absolute deviation (robust dispersion for
    heavy-tailed transcript series — latency spikes, token bursts).
    Arrow-only: the inner median-of-deviations re-centers per window, so
    there is no single-Window Catalyst form; the kernel is the same
    strided-block shape as conv_quantile (kernels.conv_mad)."""
    spec = RollSpec(width=width, min_obs=min_obs, na_restore=na_restore,
                    max_group_rows=max_group_rows)

    def kernel(pdf):
        x = pdf[value].to_numpy(dtype=np.float64, na_value=np.nan)
        return {out: K.conv_mad(x, width, min_obs=spec.effective_min_obs,
                                na_restore=na_restore)}

    return _apply_kernel(df, [value], by, order, [(out, "double")], kernel, spec=spec)
