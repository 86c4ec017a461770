"""Naive per-window numpy recomputation of the reference semantics.

This plays the role zoo::rollapplyr(partial=TRUE) + base-R stats play in
the reference's own test suite (/root/reference/tests/testthat/test-zoo.R):
an INDEPENDENT, deliberately-naive oracle every engine path must agree
with. Each function recomputes every window from scratch following the
reference's offline kernels (file:line cites per op).

Conventions: x is a float64 numpy array with NaN as missing; weights are
aligned newest-last (weight for the row k lags back = weights[-1-k],
reference roll_vec.h:556); outputs are float64 with NaN for NULL.
"""

from __future__ import annotations

import numpy as np

EPS = float(np.finfo(np.float64).eps)
SQRT_EPS = float(np.sqrt(EPS))


def _windows(x: np.ndarray, width: int):
    """Yield (i, window_values, window_weights_slice_fn) per row."""
    n = len(x)
    for i in range(n):
        lo = max(0, i - width + 1)
        yield i, x[lo : i + 1]


def _wts(weights: np.ndarray | None, width: int, m: int) -> np.ndarray:
    if weights is None:
        return np.ones(m)
    w = np.asarray(weights, dtype=np.float64)[-width:]
    return w[-m:]


def _gate_restore(out, x, na_restore):
    if na_restore:
        out = np.where(np.isnan(x), np.nan, out)
    return out


def roll_sum(x, width, weights=None, min_obs=None, na_restore=False):
    """roll_vec.h:511-578 (RollSumOfflineVec)."""
    x = np.asarray(x, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, win in _windows(x, width):
        w = _wts(weights, width, len(win))
        ok = ~np.isnan(win)
        if ok.sum() >= min_obs:
            out[i] = np.sum(w[ok] * win[ok])
    return _gate_restore(out, x, na_restore)


def roll_mean(x, width, weights=None, min_obs=None, na_restore=False):
    """roll_vec.h:946-1011."""
    x = np.asarray(x, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, win in _windows(x, width):
        w = _wts(weights, width, len(win))
        ok = ~np.isnan(win)
        if ok.sum() >= min_obs:
            out[i] = np.sum(w[ok] * win[ok]) / np.sum(w[ok])
    return _gate_restore(out, x, na_restore)


def roll_prod(x, width, weights=None, min_obs=None, na_restore=False):
    """roll_vec.h:743-812: prod(w_k) * prod(x_k) with zero short-circuit."""
    x = np.asarray(x, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, win in _windows(x, width):
        w = _wts(weights, width, len(win))
        ok = ~np.isnan(win)
        if ok.sum() >= min_obs:
            vals = win[ok]
            if np.any(vals == 0):
                out[i] = 0.0
            else:
                out[i] = np.prod(w[ok]) * np.prod(vals)
    return _gate_restore(out, x, na_restore)


def roll_min(x, width, min_obs=None, na_restore=False):
    x = np.asarray(x, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, win in _windows(x, width):
        ok = ~np.isnan(win)
        if ok.sum() >= min_obs:
            out[i] = np.min(win[ok])
    return _gate_restore(out, x, na_restore)


def roll_max(x, width, min_obs=None, na_restore=False):
    x = np.asarray(x, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, win in _windows(x, width):
        ok = ~np.isnan(win)
        if ok.sum() >= min_obs:
            out[i] = np.max(win[ok])
    return _gate_restore(out, x, na_restore)


def _idx_extreme(x, width, min_obs, na_restore, want_min):
    """roll_vec.h:1438-1516 (idxmin) / :1613-1691 (idxmax).

    Window-relative index: expanding phase (i < width) emits the 1-based
    series position of the extreme; rolling phase emits
    width - (i - idx) where idx is the 0-based series position.
    Ties -> most recent (offline scans newest-first keeping first hit
    with <=, i.e. the most recent wins).
    """
    x = np.asarray(x, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i in range(len(x)):
        lo = max(0, i - width + 1)
        win = x[lo : i + 1]
        ok = ~np.isnan(win)
        if ok.sum() >= min_obs:
            vals = np.where(ok, win, np.inf if want_min else -np.inf)
            # most recent tie: reverse, argmin/argmax returns first = newest
            rev = vals[::-1]
            pos_rev = int(np.argmin(rev) if want_min else np.argmax(rev))
            idx = lo + (len(win) - 1 - pos_rev)  # 0-based series position
            if i < width:
                out[i] = idx + 1
            else:
                out[i] = width - (i - idx)
    return _gate_restore(out, x, na_restore)


def roll_idxmin(x, width, min_obs=None, na_restore=False):
    return _idx_extreme(x, width, min_obs, na_restore, True)


def roll_idxmax(x, width, min_obs=None, na_restore=False):
    return _idx_extreme(x, width, min_obs, na_restore, False)


def roll_quantile(x, width, p, weights=None, min_obs=None, na_restore=False):
    """roll_vec.h:1956-2095 (RollQuantileOfflineVec).

    Weighted scan from the top of the sorted window accumulating weight
    mass until mass/total >= 1-p; average with the next lower order
    statistic when the mass equals 1-p within sqrt(eps). Equal weights
    == Hyndman-Fan type 2 == R quantile(type=2).
    """
    x = np.asarray(x, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    pp = 1.0 - p  # dispatch passes 1-p to the offline kernel (src/roll.cpp:916)
    out = np.full(len(x), np.nan)
    for i, win in _windows(x, width):
        w = _wts(weights, width, len(win))
        ok = ~np.isnan(win)
        if ok.sum() < min_obs or ok.sum() == 0:
            continue
        vals, wts = win[ok], w[ok]
        order = np.argsort(vals, kind="stable")
        sv, sw = vals[order], wts[order]
        total = sw.sum()
        mass = 0.0
        k = len(sv) - 1
        while k >= 0:
            mass += sw[k]
            if mass / total >= pp:
                break
            k -= 1
        k = max(k, 0)
        if abs(mass / total - pp) <= SQRT_EPS and k - 1 >= 0:
            out[i] = (sv[k] + sv[k - 1]) / 2
        else:
            out[i] = sv[k]
    return _gate_restore(out, x, na_restore)


def roll_median(x, width, weights=None, min_obs=None, na_restore=False):
    return roll_quantile(x, width, 0.5, weights, min_obs, na_restore)


def _wvar(vals, wts, center):
    """Unbiased weighted variance, reference denominator (roll_vec.h:2404)."""
    sum_w = wts.sum()
    sumsq_w = (wts * wts).sum()
    mu = (wts * vals).sum() / sum_w if center else 0.0
    sumsq = (wts * (vals - mu) ** 2).sum()
    return sumsq / (sum_w - sumsq_w / sum_w)


def roll_var(x, width, weights=None, min_obs=None, na_restore=False, center=True):
    x = np.asarray(x, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, win in _windows(x, width):
        w = _wts(weights, width, len(win))
        ok = ~np.isnan(win)
        n_obs = ok.sum()
        if n_obs > 1 and n_obs >= min_obs:
            v = _wvar(win[ok], w[ok], center)
            if v > EPS:
                out[i] = v
            elif v > -EPS:
                out[i] = 0.0
    return _gate_restore(out, x, na_restore)


def roll_sd(x, width, weights=None, min_obs=None, na_restore=False, center=True):
    return np.sqrt(roll_var(x, width, weights, min_obs, na_restore, center))


def roll_scale(x, width, weights=None, min_obs=None, na_restore=False,
               center=True, scale=True):
    """roll_vec.h:3016-3180."""
    x = np.asarray(x, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, win in _windows(x, width):
        w = _wts(weights, width, len(win))
        ok = ~np.isnan(win)
        n_obs = ok.sum()
        if n_obs < min_obs or n_obs == 0:
            continue
        vals, wts = win[ok], w[ok]
        x_last = vals[-1]  # most recent non-missing
        mu = (wts * vals).sum() / wts.sum() if center else 0.0
        centered = x_last - mu if center else x_last
        if scale:
            v = _wvar(vals, wts, center)
            if n_obs > 1 and v > EPS:
                out[i] = centered / np.sqrt(v)
        else:
            out[i] = centered
    return _gate_restore(out, x, na_restore)


def _pair_windows(x, y, width):
    n = len(x)
    for i in range(n):
        lo = max(0, i - width + 1)
        yield i, x[lo : i + 1], y[lo : i + 1]


def roll_cov(x, y, width, weights=None, min_obs=None, na_restore=False, center=True):
    """roll_vec.h:3969-4152 (pairwise-complete, unbiased denominator)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, wx, wy in _pair_windows(x, y, width):
        w = _wts(weights, width, len(wx))
        ok = ~np.isnan(wx) & ~np.isnan(wy)
        n_obs = ok.sum()
        if n_obs > 1 and n_obs >= min_obs:
            vx, vy, wts = wx[ok], wy[ok], w[ok]
            sum_w = wts.sum()
            sumsq_w = (wts * wts).sum()
            mx = (wts * vx).sum() / sum_w if center else 0.0
            my = (wts * vy).sum() / sum_w if center else 0.0
            out[i] = (wts * (vx - mx) * (vy - my)).sum() / (sum_w - sumsq_w / sum_w)
    if na_restore:
        out = np.where(np.isnan(x) | np.isnan(y), np.nan, out)
    return out


def roll_cor(x, y, width, weights=None, min_obs=None, na_restore=False):
    """Scale branch of the cov kernels (roll_vec.h:4112-4125)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, wx, wy in _pair_windows(x, y, width):
        w = _wts(weights, width, len(wx))
        ok = ~np.isnan(wx) & ~np.isnan(wy)
        n_obs = ok.sum()
        if n_obs > 1 and n_obs >= min_obs:
            vx, vy, wts = wx[ok], wy[ok], w[ok]
            sum_w = wts.sum()
            mx = (wts * vx).sum() / sum_w
            my = (wts * vy).sum() / sum_w
            ssx = (wts * (vx - mx) ** 2).sum()
            ssy = (wts * (vy - my) ** 2).sum()
            ssxy = (wts * (vx - mx) * (vy - my)).sum()
            if ssx > EPS and ssy > EPS:
                out[i] = ssxy / (np.sqrt(ssx) * np.sqrt(ssy))
    if na_restore:
        out = np.where(np.isnan(x) | np.isnan(y), np.nan, out)
    return out


def roll_crossprod(x, y, width, weights=None, min_obs=None, na_restore=False):
    """Raw sum(w x y), gate min_obs only (roll_vec.h:5081)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    out = np.full(len(x), np.nan)
    for i, wx, wy in _pair_windows(x, y, width):
        w = _wts(weights, width, len(wx))
        ok = ~np.isnan(wx) & ~np.isnan(wy)
        if ok.sum() >= min_obs:
            out[i] = (w[ok] * wx[ok] * wy[ok]).sum()
    if na_restore:
        out = np.where(np.isnan(x) | np.isnan(y), np.nan, out)
    return out


def roll_any(x, width, min_obs=1, na_restore=False):
    """Kleene OR, emit logic roll_vec.h:115-127. x: float array of 0/1/NaN.
    Returns float array of 0/1/NaN."""
    x = np.asarray(x, dtype=np.float64)
    out = np.full(len(x), np.nan)
    for i in range(len(x)):
        lo = max(0, i - width + 1)
        win = x[lo : i + 1]
        ok = ~np.isnan(win)
        n_obs = ok.sum()
        full = min(width, i + 1)
        if n_obs >= min_obs:
            if np.any(win[ok] != 0):
                out[i] = 1.0
            elif n_obs == full:
                out[i] = 0.0
    return _gate_restore(out, x, na_restore)


def roll_all(x, width, min_obs=1, na_restore=False):
    """Kleene AND, emit logic roll_vec.h:277-289."""
    x = np.asarray(x, dtype=np.float64)
    out = np.full(len(x), np.nan)
    for i in range(len(x)):
        lo = max(0, i - width + 1)
        win = x[lo : i + 1]
        ok = ~np.isnan(win)
        n_obs = ok.sum()
        full = min(width, i + 1)
        if n_obs >= min_obs:
            if np.any(win[ok] == 0):
                out[i] = 0.0
            elif n_obs == full:
                out[i] = 1.0
    return _gate_restore(out, x, na_restore)


def roll_lm(x, y, width, weights=None, min_obs=None, intercept=True):
    """Per-window weighted OLS oracle (roll_mat.h:5513-5614 semantics).

    Returns dict of arrays: coef_x, intercept, r2, se_x, se_intercept.
    Rows with any NA in (x, y) are excluded (complete_obs forced TRUE,
    src/roll.cpp:2059-2066). Gates: n_obs >= max(min_obs, df_fit) where
    df_fit = 2 (1 regressor + intercept) or 1; var_y > eps for r2;
    df_resid = n_obs - df_fit > 0 for se.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    min_obs = width if min_obs is None else min_obs
    n = len(x)
    res = {k: np.full(n, np.nan) for k in ("coef_x", "intercept", "r2", "se_x", "se_intercept")}
    df_fit = 2 if intercept else 1
    for i in range(n):
        lo = max(0, i - width + 1)
        wx, wy = x[lo : i + 1], y[lo : i + 1]
        w = _wts(weights, width, len(wx))
        ok = ~np.isnan(wx) & ~np.isnan(wy)
        n_obs = int(ok.sum())
        if n_obs < max(min_obs, df_fit) or n_obs < 2:
            continue
        vx, vy, wts = wx[ok], wy[ok], w[ok]
        sum_w = wts.sum()
        if intercept:
            mx = (wts * vx).sum() / sum_w
            my = (wts * vy).sum() / sum_w
            # pin the mean of an exactly-constant window to the constant
            # so the centered moments are exactly 0 (the rank-deficiency
            # decision hangs on A == 0; mirrors the kernel contract)
            if vx.max() == vx.min():
                mx = vx[0]
            if vy.max() == vy.min():
                my = vy[0]
        else:
            mx = my = 0.0
        # RAW centered weighted crossprod moments: roll_lm's phase 1 uses
        # the crossprod kernels (center=intercept, NOT the unbiased-divided
        # cov), src/roll.cpp:2069-2087 — this is what makes se match
        # stats::lm in the reference's own oracle (helper-zoo.R:188)
        A = (wts * (vx - mx) ** 2).sum()
        b = (wts * (vx - mx) * (vy - my)).sum()
        var_y = (wts * (vy - my) ** 2).sum()
        if A == 0.0 or not np.isfinite(A):
            continue
        beta = b / A
        res["coef_x"][i] = beta
        if intercept:
            res["intercept"][i] = my - mx * beta
        r2 = beta * A * beta / var_y if var_y > EPS else np.nan
        res["r2"][i] = r2
        df_resid = n_obs - df_fit
        if df_resid > 0 and not np.isnan(r2):
            var_resid = (1 - r2) * var_y / df_resid
            res["se_x"][i] = np.sqrt(var_resid / A)
            if intercept:
                res["se_intercept"][i] = np.sqrt(
                    var_resid * (1 / sum_w + mx * (1 / A) * mx)
                )
    return res
