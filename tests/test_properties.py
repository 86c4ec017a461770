"""Property-based kernel tests: the vectorized conv_* kernels must agree
with the naive per-window oracle on arbitrary series — random NaN
patterns, zeros, negative values, width/min_obs extremes, weights longer
than the window — the corners a fixed grid misses (SURVEY.md §5)."""

from __future__ import annotations

import os

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from roll_spark.operators import kernels as K
from tests import oracle

SERIES = arrays(
    np.float64,
    st.integers(1, 60),
    elements=st.one_of(
        # |x| < ~1e-154 makes x^2 underflow to SUBNORMAL: a squared
        # moment like 1e-319 keeps ~4 significant bits, so any two
        # float64 implementations legitimately disagree at ~1e-5
        # relative — snap that regime to exact 0 (the mirror of
        # test_prod's overflow clip at the other end of the range)
        st.floats(-1e6, 1e6, allow_nan=False, width=64).map(
            lambda v: 0.0 if abs(v) < 1e-150 else v
        ),
        st.just(0.0),
        st.just(np.nan),
    ),
)
WIDTH = st.integers(1, 12)
PQ = st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0])


def _weights(rng_seed: int, width: int, kind: str) -> np.ndarray | None:
    if kind == "equal":
        return None
    if kind == "exp":
        return 0.9 ** np.arange(2 * width, 0, -1.0)
    rng = np.random.default_rng(rng_seed)
    return rng.uniform(0.1, 3.0, size=width)


def _close(
    a: np.ndarray, b: np.ndarray, rtol: float = 1e-9, atol: float = 1e-9
) -> bool:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    both_nan = np.isnan(a) & np.isnan(b)
    # default 1e-9 relative covers float64 reassociation between two
    # correct implementations of the cancellation-free two-pass kernels
    ok = np.isclose(a, b, rtol=rtol, atol=atol, equal_nan=False)
    return bool(np.all(both_nan | ok))


def _comoment_atol(x: np.ndarray, y: np.ndarray, width: int) -> float:
    """Float64 error-model bound for a mixed-sign co-moment sum.

    Any summation of n terms carries |err| <= c*n*eps*sum|terms|; for a
    (weighted, mean-centered) co-moment the term magnitude is bounded by
    max|x|*max|y| after the sum_w division, and the mean's own
    reassociation perturbs each centered term by ~n*eps*max|x| more.
    Two CORRECT implementations therefore legitimately differ by up to
    ~c*n*eps*max|x|*max|y| ABSOLUTE, with no relative bound at all when
    the co-moment itself cancels toward 0 (unbounded condition number).
    c=64 is slack for the two summation orders under test."""
    mx = float(np.nanmax(np.abs(x), initial=0.0))
    my = float(np.nanmax(np.abs(y), initial=0.0))
    return max(1e-9, 64.0 * width * np.finfo(np.float64).eps * mx * my)


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '150')), deadline=None)
@given(x=SERIES, width=WIDTH, min_obs=st.integers(1, 12),
       kind=st.sampled_from(["equal", "exp", "arbitrary"]),
       na_restore=st.booleans(), seed=st.integers(0, 10))
def test_sum_mean_var_match_oracle(x, width, min_obs, kind, na_restore, seed):
    w = _weights(seed, width, kind)
    for kfn, ofn in ((K.conv_sum, oracle.roll_sum),
                     (K.conv_mean, oracle.roll_mean),
                     (K.conv_var, oracle.roll_var),
                     (K.conv_sd, oracle.roll_sd)):
        got = kfn(x, width, weights=w, min_obs=min_obs, na_restore=na_restore)
        want = ofn(x, width, weights=None if w is None else list(w),
                   min_obs=min_obs, na_restore=na_restore)
        assert _close(got, want), (kfn.__name__, width, min_obs, kind)


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '150')), deadline=None)
@given(x=SERIES, width=WIDTH, p=PQ, min_obs=st.integers(1, 12),
       kind=st.sampled_from(["equal", "exp", "arbitrary"]),
       seed=st.integers(0, 10))
def test_quantile_matches_oracle(x, width, p, min_obs, kind, seed):
    w = _weights(seed, width, kind)
    got = K.conv_quantile(x, width, p, weights=w, min_obs=min_obs)
    want = oracle.roll_quantile(x, width, p,
                                weights=None if w is None else list(w),
                                min_obs=min_obs)
    assert _close(got, want), (width, p, min_obs, kind)


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '100')), deadline=None)
@given(x=SERIES, width=WIDTH, min_obs=st.integers(1, 12),
       kind=st.sampled_from(["equal", "exp", "arbitrary"]),
       seed=st.integers(0, 10))
def test_cov_cor_match_oracle(x, width, min_obs, kind, seed):
    rng = np.random.default_rng(seed + 100)
    y = x[::-1].copy()
    y[rng.random(len(y)) < 0.2] = np.nan
    w = _weights(seed, width, kind)
    wl = None if w is None else list(w)
    # co-moments have mixed-sign products: the sum's condition number
    # kappa = sum|w dx dy| / |sum w dx dy| is unbounded (hypothesis finds
    # kappa ~ 1e10 fixtures: +-1e6 values with a ~1e1 co-moment), so no
    # fixed rtol is sound — the error model gives an ABSOLUTE bound
    # scaled by the data magnitude instead (_comoment_atol). Variance is
    # exempt: its two-pass sum has non-negative terms, hence no
    # cancellation (tested at 1e-9 above).
    atol = _comoment_atol(x, y, width)
    assert _close(
        K.conv_cov(x, y, width, weights=w, min_obs=min_obs),
        oracle.roll_cov(x, y, width, weights=wl, min_obs=min_obs),
        rtol=5e-8,
        atol=atol,
    )
    # cor is scale-free (|cor| <= 1): 1e-6 absolute is a 6-digit check,
    # and the cov-cancellation error divided by sd*sd can exceed any
    # fixed relative bound on adversarially clustered data.
    assert _close(
        K.conv_cor(x, y, width, weights=w, min_obs=min_obs),
        oracle.roll_cor(x, y, width, weights=wl, min_obs=min_obs),
        rtol=5e-8,
        atol=1e-6,
    )
    assert _close(
        K.conv_crossprod(x, y, width, weights=w, min_obs=min_obs),
        oracle.roll_crossprod(x, y, width, weights=wl, min_obs=min_obs),
        rtol=5e-8,
        atol=atol,
    )


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '80')), deadline=None)
@given(x=SERIES, width=WIDTH, min_obs=st.integers(1, 12),
       kind=st.sampled_from(["equal", "exp"]), seed=st.integers(0, 10))
def test_prod_matches_oracle(x, width, min_obs, kind, seed):
    # bound magnitudes so naive products stay in float64 range
    x = np.clip(x, -50.0, 50.0)
    w = _weights(seed, width, kind)
    got = K.conv_prod(x, width, weights=w, min_obs=min_obs)
    want = oracle.roll_prod(x, width, weights=None if w is None else list(w),
                            min_obs=min_obs)
    # log-space product: relative agreement only
    a, b = np.asarray(got), np.asarray(want)
    both_nan = np.isnan(a) & np.isnan(b)
    ok = np.isclose(a, b, rtol=1e-7, atol=1e-9)
    assert np.all(both_nan | ok)


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '100')), deadline=None)
@given(x=SERIES, width=WIDTH, min_obs=st.integers(1, 12),
       kind=st.sampled_from(["equal", "exp", "arbitrary"]),
       intercept=st.booleans(), seed=st.integers(0, 10))
def test_lm_matches_oracle(x, width, min_obs, kind, intercept, seed):
    rng = np.random.default_rng(seed + 200)
    y = 0.5 * x + rng.normal(size=len(x))
    y[rng.random(len(y)) < 0.15] = np.nan
    w = _weights(seed, width, kind)
    got = K.conv_lm_k(x[:, None], y, width, weights=w, min_obs=min_obs,
                      intercept=intercept)
    want = oracle.roll_lm(x, y, width, weights=None if w is None else list(w),
                          min_obs=min_obs, intercept=intercept)
    # normal-equation solves amplify co-moment conditioning; 1e-6 relative
    # is the honest float64 bound for adversarial (+-1e6, near-collinear)
    # windows — typical data agrees to ~1e-12 (see test_lm grid tests)
    pairs = [("coef_x", got["coef"][:, 0]), ("r2", got["r2"]),
             ("se_x", got["se"][:, 0])]
    if intercept:
        pairs += [("intercept", got["intercept"]),
                  ("se_intercept", got["se_intercept"])]
    # standard errors go through var_resid = (1-r2)*var_y — a cancellation
    # with condition number r2/(1-r2), so near-perfect fits make ANY two
    # float64 implementations disagree in se; both formulas are the
    # reference's own (roll_mat.h:5582-5595). Compare se only away from
    # the r2 -> 1 wall.
    wr2 = np.asarray(want["r2"], dtype=np.float64)
    se_ok = ~(wr2 > 1.0 - 1e-6)
    for name, g in pairs:
        if name.startswith("se"):
            g = np.where(se_ok, g, np.nan)
            wv = np.where(se_ok, want[name], np.nan)
        else:
            wv = want[name]
        assert _close(g, wv, rtol=1e-6), (name, width, min_obs, kind)


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '100')), deadline=None)
@given(
    deltas=arrays(np.int64, st.integers(0, 400),
                  elements=st.integers(0, 10**10)),
    data=st.data(),
)
def test_gorilla_v2_roundtrip_property(deltas, data):
    """RSG2 (vectorized) round-trips ANY (monotone-ts, float64) chunk
    bit-exactly and agrees with the scalar RSG1 oracle — including NaN,
    +-inf, -0.0, denormals, and every DoD bucket."""
    from roll_spark.compression import (
        decode_chunk, decode_chunk_v2, encode_chunk, encode_chunk_v2,
    )

    n = len(deltas)
    ts = np.cumsum(deltas)
    specials = st.sampled_from(
        [np.nan, np.inf, -np.inf, -0.0, 0.0, 2.0**-1074, -2.0**1023]
    )
    vals = np.asarray(
        data.draw(arrays(np.float64, n,
                         elements=st.one_of(st.floats(allow_nan=True,
                                                      allow_infinity=True,
                                                      width=64),
                                            specials))),
        dtype=np.float64,
    )
    t1, v1 = decode_chunk(encode_chunk(ts, vals))
    t2, v2 = decode_chunk_v2(encode_chunk_v2(ts, vals))
    bits = vals.view(np.uint64) if n else np.array([], np.uint64)
    assert np.array_equal(ts, t1) and np.array_equal(ts, t2)
    assert np.array_equal(bits, v1.view(np.uint64))
    assert np.array_equal(bits, v2.view(np.uint64))


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '100')), deadline=None)
@given(x=SERIES, width=WIDTH, min_obs=st.integers(1, 12))
def test_mad_matches_naive(x, width, min_obs):
    got = K.conv_mad(x, width, min_obs=min_obs)
    for i in range(len(x)):
        win = x[max(0, i - width + 1): i + 1]
        obs = win[~np.isnan(win)]
        if len(obs) >= max(min_obs, 1):
            m = np.median(obs)
            want = np.median(np.abs(obs - m))
            assert np.isclose(got[i], want, rtol=1e-12, atol=0), (i, got[i], want)
        else:
            assert np.isnan(got[i]), i


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '100')), deadline=None)
@given(
    x=SERIES,
    halflife=st.sampled_from([1.0, 60.0, 3600.0, 7 * 86400.0]),
    gap_scale=st.sampled_from([0.001, 1.0, 3600.0, 86400.0]),
    min_obs=st.integers(1, 5),
    n_splits=st.integers(0, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_ewma_time_stream_equals_batch_any_timescale(
    x, halflife, gap_scale, min_obs, n_splits, seed
):
    """The blocked scan must agree with itself under ANY micro-batch
    split, for halflife/gap combinations spanning 9 orders of magnitude
    (forcing 1-row blocks through single-block evaluation)."""
    rng = np.random.default_rng(seed)
    n = len(x)
    t = np.cumsum(rng.exponential(gap_scale, n))
    t_us = np.maximum((t * 1e6).astype(np.int64), 1)
    t_us = np.cumsum(np.maximum(np.diff(np.concatenate([[0], t_us])), 1))
    full = K.conv_ewma_time(x, t_us, halflife, min_obs=min_obs)
    cuts = sorted(set(int(c) for c in rng.integers(0, n + 1, n_splits)) | {0, n})
    state, parts = None, []
    for lo, hi in zip(cuts, cuts[1:]):
        res, state = K.online_ewma_time(
            x[lo:hi], t_us[lo:hi], halflife, min_obs=min_obs, state=state)
        parts.append(res)
    got = np.concatenate(parts) if parts else np.empty(0)
    assert np.array_equal(np.isnan(got), np.isnan(full))
    ok = ~np.isnan(full)
    # batch and stream traverse identical blocks except at cut points;
    # differences are pure float reassociation at the carry hand-off.
    # The numerator is a signed sum, so its reassociation error bounds
    # at ~eps * sum|x_j| e_j; after dividing by den that is an ABSOLUTE
    # error up to ~eps * max|x| on the ratio (a cancelled numerator has
    # no relative accuracy to preserve) — hence the scaled atol.
    scale = float(np.nanmax(np.abs(x))) if ok.any() else 0.0
    assert np.allclose(got[ok], full[ok], rtol=1e-9, atol=1e-9 * (scale + 1.0))


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '100')), deadline=None)
@given(x=SERIES, width=WIDTH, min_obs=st.integers(1, 12),
       alpha=st.sampled_from([0.0, 0.1, 0.2, 0.25, 0.4, 0.49]))
def test_trimmed_mean_matches_naive(x, width, min_obs, alpha):
    got = K.conv_trimmed_mean(x, width, alpha=alpha, min_obs=min_obs)
    for i in range(len(x)):
        win = x[max(0, i - width + 1): i + 1]
        obs = np.sort(win[~np.isnan(win)])
        n = len(obs)
        if n >= max(min_obs, 1):
            k = int(np.floor(alpha * n))
            want = obs[k: n - k].mean()
            # Same failure class the EWMA split test documents above:
            # when the kept values cancel to ~eps * sum|obs| the NAIVE
            # oracle's own pairwise sum carries that absolute error, so
            # no kernel (the blocked one accumulates in longdouble) can
            # match it to rtol=1e-12 with atol=0 — a cancelled sum has
            # no relative accuracy to preserve. Scaled atol bounds the
            # oracle-side reassociation error: eps * n * max|obs| / m.
            scale = float(np.abs(obs).max()) if n else 0.0
            atol = 4e-15 * n * (scale + 1.0)
            assert np.isclose(got[i], want, rtol=1e-12, atol=atol), (i, got[i], want)
        else:
            assert np.isnan(got[i]), i


@settings(max_examples=int(os.environ.get('HYP_EXAMPLES', '60')), deadline=None)
@given(x=SERIES, width=WIDTH, min_obs=st.integers(1, 8), seed=st.integers(0, 2**31 - 1),
       ties=st.booleans())
def test_spearman_matches_naive(x, width, min_obs, seed, ties):
    rng = np.random.default_rng(seed)
    y = rng.normal(size=len(x))
    if ties:  # quantize both to force heavy tie structure
        x = np.floor(x / 10) * 10
        y = np.floor(y * 2) / 2
    y[rng.random(len(x)) < 0.2] = np.nan
    got = K.conv_spearman(x, y, width, min_obs=min_obs)

    def midrank(v):
        return np.array([((v < e).sum() + (v <= e).sum() + 1) / 2 for e in v])

    for i in range(len(x)):
        sl = slice(max(0, i - width + 1), i + 1)
        xs, ys = x[sl], y[sl]
        ok = ~np.isnan(xs) & ~np.isnan(ys)
        xs, ys = xs[ok], ys[ok]
        want = np.nan
        if len(xs) >= max(min_obs, 2):
            rx, ry = midrank(xs), midrank(ys)
            dx, dy = rx - rx.mean(), ry - ry.mean()
            ssx, ssy = (dx ** 2).sum(), (dy ** 2).sum()
            if ssx > 0 and ssy > 0:
                want = (dx * dy).sum() / np.sqrt(ssx * ssy)
        g = got[i]
        assert (np.isnan(g) and np.isnan(want)) or np.isclose(g, want, rtol=1e-10), (
            i, g, want)
