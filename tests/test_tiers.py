"""Retention tiers: Chan-merged cascade == direct recompute; gap-fill;
kill/resume bit-identity of the checkpointed pipeline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from roll_spark.plans import tiers as T
from roll_spark.plans.checkpoint import CheckpointedPipeline
from roll_spark.sources.transcripts import derive_series, generate_transcripts


@pytest.fixture(scope="module")
def tdf(spark):
    df = derive_series(
        generate_transcripts(spark, n_convs=8, median_turns=60, skew_factor=20)
    )
    return df.filter(F.col("latency_s").isNotNull()).cache()


def _stats_map(df):
    rows = df.collect()
    out = {}
    for r in rows:
        d = r.asDict()
        key = (d["conv_id"], d["bucket_ts"])
        out[key] = d
    return out


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_cascade_equals_direct(spark, tdf, tier):
    """Merging finer sufficient stats (Chan) must reproduce a direct
    groupBy from raw EXACTLY for n/sum/min/max and to FP tolerance for
    m2 — the continuous-aggregate correctness contract."""
    chain = {"1h": ("1m", "1h"), "1d": ("1m", "1h", "1d")}[tier]
    cascaded = T.finalize(T.cascade(tdf, "latency_s", "ts", "conv_id", tiers=chain)[tier])
    direct = T.finalize(T.rollup_raw(tdf, "latency_s", "ts", "conv_id", tier))
    a, b = _stats_map(cascaded), _stats_map(direct)
    assert a.keys() == b.keys()
    for k in a:
        for col in ("n", "min_x", "max_x", "first_ts", "last_ts", "first_x", "last_x"):
            assert a[k][col] == b[k][col], (k, col, a[k][col], b[k][col])
        assert np.isclose(a[k]["sum_x"], b[k]["sum_x"], rtol=1e-12), k
        assert np.isclose(a[k]["mean_x"], b[k]["mean_x"], rtol=1e-12), k
        va, vb = a[k]["var_x"], b[k]["var_x"]
        if va is None or vb is None:
            assert va == vb, k
        else:
            assert np.isclose(va, vb, rtol=1e-9, atol=1e-12), k


def test_rollup_mean_equals_raw_groupby(spark, tdf):
    got = T.finalize(T.rollup_raw(tdf, "text_len", "ts", "conv_id", "1h"))
    want = (
        tdf.groupBy("conv_id", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(F.avg("text_len").alias("m"), F.count("text_len").alias("n"))
    )
    j = got.join(want, ["conv_id", "bucket_ts"])
    bad = j.filter(
        (F.abs(F.col("mean_x") - F.col("m")) > 1e-9) | (got["n"] != want["n"])
    ).count()
    assert bad == 0


def test_gapfill_locf_and_linear(spark, tdf):
    stats = T.finalize(T.rollup_raw(tdf, "text_len", "ts", "conv_id", "1h"))
    for method in ("locf", "linear"):
        filled = T.gapfill(stats, "conv_id", "1h", value="mean_x", method=method)
        pdf = filled.orderBy("conv_id", "bucket_ts").toPandas()
        # dense grid: hourly steps, no holes
        for conv, g in pdf.groupby("conv_id"):
            steps = g["bucket_ts"].diff().dropna().dt.total_seconds().unique()
            assert set(steps) == {3600.0}, (conv, steps)
            # observed buckets keep their value
            obs = g[~g["is_gap"]]
            assert np.allclose(obs["mean_x_filled"], obs["mean_x"])
            # gaps: filled value must lie between bracketing observations
            vals = g["mean_x"].to_numpy()
            fill = g["mean_x_filled"].to_numpy()
            isgap = g["is_gap"].to_numpy()
            for i in np.where(isgap)[0]:
                prev = next((vals[j] for j in range(i - 1, -1, -1) if not isgap[j]), None)
                nxt = next((vals[j] for j in range(i + 1, len(g)) if not isgap[j]), None)
                if prev is None:
                    continue
                if method == "locf":
                    assert fill[i] == prev, (conv, i)
                elif nxt is not None:
                    lo, hi = min(prev, nxt), max(prev, nxt)
                    assert lo - 1e-9 <= fill[i] <= hi + 1e-9, (conv, i)


def _run_pipeline(spark, tdf, root):
    pipe = CheckpointedPipeline(spark, root)
    s1m = pipe.stage(
        "tier_1m",
        lambda: T.rollup_raw(tdf, "text_len", "ts", "conv_id", "1m"),
        params={"tier": "1m", "value": "text_len"},
    )
    s1h = pipe.stage(
        "tier_1h",
        lambda: T.merge_tier(s1m, "conv_id", "1h"),
        params={"tier": "1h", "from": "1m"},
    )
    s1d = pipe.stage(
        "tier_1d",
        lambda: T.merge_tier(s1h, "conv_id", "1d"),
        params={"tier": "1d", "from": "1h"},
    )
    return pipe, s1d


def _digest(df):
    import hashlib

    rows = sorted(str(sorted(r.asDict().items())) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def test_checkpoint_resume_bit_identical(spark, tdf, tmp_path):
    root = str(tmp_path / "ckpt")
    pipe, final = _run_pipeline(spark, tdf, root)
    cold = _digest(final)
    m = pipe.manifest("tier_1d")
    assert m and m["complete"] and m["metrics"]["rows"] > 0

    # simulated kill: the 1d stage never finished (manifest gone)
    pipe.invalidate("tier_1d")
    pipe2, final2 = _run_pipeline(spark, tdf, root)
    assert _digest(final2) == cold

    # full restart with everything cached: stages are read, not recomputed
    pipe3, final3 = _run_pipeline(spark, tdf, root)
    assert _digest(final3) == cold

    # changed params -> stale checkpoint must NOT be served
    stale = pipe3.is_complete("tier_1d", {"tier": "1d", "from": "SOMETHING_ELSE"})
    assert not stale


def test_table_source_resolution(spark, tmp_path):
    """read_table resolves parquet paths and errors clearly on iceberg:
    refs without the runtime jar; write_tier partitions + sorts."""
    import pytest as _pytest

    from roll_spark.sources.iceberg import has_iceberg, read_table, write_tier

    p = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr("id", "id % 7 AS g", "CAST(id AS DOUBLE) v").write.parquet(p)
    df = read_table(spark, p)
    assert df.count() == 100
    assert not has_iceberg(spark)
    with _pytest.raises(RuntimeError, match="Iceberg runtime"):
        read_table(spark, "iceberg:roll.db.transcripts")
    out = str(tmp_path / "tier_out")
    write_tier(df, out, partition_by=["g"], sort_within=["g", "id"])
    back = spark.read.parquet(out)
    assert back.count() == 100 and "g" in back.columns


def test_realtime_view_equals_full_rollup(spark, tdf):
    """Real-time continuous aggregate: materialized-before-cutoff union
    on-the-fly tail == full recomputation, bit-identical — including a
    NON-bucket-aligned cutoff (truncated to the bucket so no bucket
    straddles the seam)."""
    full = _stats_map(T.finalize(
        T.rollup_raw(tdf, "text_len", "ts", "conv_id", "1h")))
    ts_mid = tdf.selectExpr("percentile(unix_micros(ts), 0.5) p").first().p
    import datetime

    # deliberately NOT hour-aligned: realtime_view must truncate it
    cutoff = datetime.datetime.utcfromtimestamp(ts_mid / 1e6).strftime(
        "%Y-%m-%d %H:37:11")
    mat = T.rollup_raw(
        tdf.filter(F.col("ts") < F.date_trunc(
            "hour", F.lit(cutoff).cast("timestamp"))),
        "text_len", "ts", "conv_id", "1h",
    )
    rt = _stats_map(T.finalize(T.realtime_view(
        tdf, mat, "text_len", "ts", "conv_id", "1h", cutoff=cutoff)))
    assert rt.keys() == full.keys()
    for k, want in full.items():
        got = rt[k]
        for c in ("n", "sum_x", "m2", "min_x", "max_x", "first_ts",
                  "first_x", "last_ts", "last_x", "mean_x", "sd_x"):
            w, g = want[c], got[c]
            if isinstance(w, float):
                assert g == pytest.approx(w, rel=0, abs=1e-9), (k, c)
            else:
                assert g == w, (k, c)


def test_tier_histogram_totals_and_merge(spark, tdf):
    """Histogram counts per (series, bucket) total the bucket's row
    count, edge values clamp into the boundary bins, and the 1h
    histogram equals the bin-wise SUM of 1m histograms (mergeability —
    the continuous-aggregate contract for distributions)."""
    h1m = T.tier_histogram(tdf, "text_len", "ts", "conv_id", "1m",
                           lo=0.0, hi=400.0, n_bins=8)
    h1h = T.tier_histogram(tdf, "text_len", "ts", "conv_id", "1h",
                           lo=0.0, hi=400.0, n_bins=8)
    direct = {(r.conv_id, r.bucket_ts, r.bin): r.cnt for r in h1h.collect()}
    merged: dict = {}
    for r in h1m.collect():
        k = (r.conv_id, r.bucket_ts.replace(minute=0, second=0, microsecond=0),
             r.bin)
        merged[k] = merged.get(k, 0) + r.cnt
    assert merged == direct
    # totals == per-bucket row counts
    totals: dict = {}
    for (cid, b, _bin), c in direct.items():
        totals[(cid, b)] = totals.get((cid, b), 0) + c
    want = {(r.conv_id, r.b): r.n for r in
            tdf.groupBy("conv_id", F.date_trunc("hour", "ts").alias("b"))
               .agg(F.count("text_len").alias("n")).collect()}
    assert totals == want


def test_tier_quantile_from_histogram(spark, tdf):
    """Percentile-on-continuous-aggregate: the p-quantile extracted from
    1m histograms merged to 1h (a) EXACTLY equals a numpy replay of the
    declared estimator (cumulative bins + within-bin linear interp —
    deterministic double algebra), and (b) is within ONE BIN WIDTH of
    the exact inverse-CDF (type-1) quantile for every bucket whose data
    lies inside [lo, hi) — the k=ceil(p*n) order statistic lives in the
    selected bin."""
    import math

    lo, hi, nb, p = 0.0, 400.0, 8, 0.75
    step = (hi - lo) / nb
    h1m = T.tier_histogram(tdf, "text_len", "ts", "conv_id", "1m",
                           lo=lo, hi=hi, n_bins=nb)
    got = {(r.conv_id, r.bucket_ts): r.q for r in
           T.tier_quantile_from_histogram(
               h1m, "conv_id", "1h", p, lo=lo, hi=hi, n_bins=nb).collect()}

    raw = tdf.select("conv_id", F.date_trunc("hour", "ts").alias("b"),
                     "text_len").collect()
    series: dict = {}
    for r in raw:
        if r.text_len is not None:
            series.setdefault((r.conv_id, r.b), []).append(float(r.text_len))
    assert set(got) == set(series)
    for key, vals in series.items():
        v = np.sort(np.asarray(vals))
        bins = np.clip(np.floor((v - lo) / step), 0, nb - 1).astype(int)
        cnts: dict = {}
        for b in bins:
            cnts[int(b)] = cnts.get(int(b), 0) + 1
        n = len(v)
        k = p * n
        cum, res = 0.0, None
        for bi in sorted(cnts):
            c = float(cnts[bi])
            if res is None and cum + c >= k:
                res = lo + bi * step + step * ((k - cum) / c)
            cum += c
        assert got[key] == pytest.approx(res, rel=0, abs=1e-12), key
        if v[0] >= lo and v[-1] < hi:  # in-range: one-bin error bound
            t1 = v[min(n - 1, max(0, math.ceil(p * n) - 1))]
            assert abs(res - t1) <= step + 1e-9, key


@pytest.mark.parametrize("vals,p", [
    ([700.0, -50.0, 900.0], 0.9),        # all out-of-range: edge-clamped bins
    ([5.0] * 7, 0.5),                    # all-ties: single bin, k mid-bin
    ([42.0], 0.99),                      # n=1, p near 1
    ([0.0, 50.0, 100.0, 150.0], 0.25),   # values exactly ON bin boundaries
    ([10.0, 20.0, 30.0, 40.0], 0.01),    # p near 0: k < first bin count
])
def test_tier_quantile_histogram_edges(spark, vals, p):
    """Adversarial corners of the histogram-quantile estimator through
    the REAL Spark op: out-of-range clamping, ties, n=1, boundary
    values, extreme p — each must exactly equal the python replay of
    the declared algebra (the error-bound clause doesn't apply
    out-of-range, but the estimator must still be deterministic and
    in [lo, hi] because clamped bins are)."""
    import datetime

    lo, hi, nb = 0.0, 200.0, 8
    step = (hi - lo) / nb
    rows = [("s", datetime.datetime(2025, 3, 1, 0, m), v)
            for m, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, x double")
    h = T.tier_histogram(df, "x", "ts", "conv_id", "1m",
                         lo=lo, hi=hi, n_bins=nb)
    out = T.tier_quantile_from_histogram(
        h, "conv_id", "1h", p, lo=lo, hi=hi, n_bins=nb).collect()
    assert len(out) == 1
    got = out[0].q

    cnts: dict = {}
    for v in vals:
        b = int(min(max(np.floor((v - lo) / step), 0), nb - 1))
        cnts[b] = cnts.get(b, 0) + 1
    n = len(vals)
    k = p * n
    cum, res = 0.0, None
    for bi in sorted(cnts):
        c = float(cnts[bi])
        if res is None and cum + c >= k:
            res = lo + bi * step + step * ((k - cum) / c)
        cum += c
    assert got == pytest.approx(res, rel=0, abs=0), (vals, p)
    assert lo <= got <= hi


def test_tier_hll_merge_equals_direct(spark, tdf):
    """HLL cascade contract: estimates off 1m sketches MERGED to 1h
    equal estimates off sketches built directly at 1h (DataSketches
    union is exact over sketch state, not approximate-on-approximate),
    and both are within the documented error band of the exact counts."""
    # DataSketches HLL takes int/bigint/string/binary (Spark contract);
    # text_len is an integral-valued double -> exact bigint cast
    t = tdf.withColumn("tl", F.col("text_len").cast("bigint"))
    h1m = T.tier_hll_sketch(t, "tl", "ts", "conv_id", "1m")
    merged = T.hll_estimate(T.merge_hll_tier(h1m, "conv_id", "1h"))
    direct = T.hll_estimate(
        T.tier_hll_sketch(t, "tl", "ts", "conv_id", "1h"))
    m = {(r.conv_id, r.bucket_ts): r.n_unique_est for r in merged.collect()}
    d = {(r.conv_id, r.bucket_ts): r.n_unique_est for r in direct.collect()}
    assert m == d
    exact = {(r.conv_id, r.bucket_ts): r.n_unique for r in
             T.tier_nunique(t, "tl", "ts", "conv_id", "1h").collect()}
    assert exact.keys() == d.keys()
    for k, e in exact.items():
        assert abs(d[k] - e) <= max(2, 0.05 * e), (k, d[k], e)
