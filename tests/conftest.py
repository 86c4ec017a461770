"""Shared fixtures: one SparkSession per test run + the reference-style
parameter grid data (three 15x5 variants with zeros / zeros+NAs, ported
from /root/reference/tests/testthat/helper-data.R in long format)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from roll_spark.session import get_spark  # noqa: E402

N_OBS = 15
SEED = 5640


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=4, app_name="roll_spark_tests")
    yield s


def _variants() -> dict[str, np.ndarray]:
    """Three series shapes mirroring helper-data.R:20-32: deterministic
    with zeros, random with zeros, random with zeros and ~20% NAs."""
    rng = np.random.default_rng(SEED)
    det = np.arange(N_OBS, dtype=np.float64)
    det[::5] = 0.0
    rand_zeros = rng.normal(size=N_OBS)
    rand_zeros[rng.random(N_OBS) < 0.2] = 0.0
    rand_nas = rng.normal(size=N_OBS)
    rand_nas[rng.random(N_OBS) < 0.2] = 0.0
    rand_nas[rng.random(N_OBS) < 0.2] = np.nan
    return {"det_zeros": det, "rand_zeros": rand_zeros, "rand_zeros_nas": rand_nas}


@pytest.fixture(scope="session")
def grid_series() -> dict[str, np.ndarray]:
    return _variants()


@pytest.fixture(scope="session")
def grid_pairs() -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """(x, y) pairs per variant for cov/cor/crossprod/lm."""
    rng = np.random.default_rng(SEED + 1)
    out = {}
    for name, x in _variants().items():
        y = rng.normal(size=N_OBS) + 0.5 * np.nan_to_num(x)
        if name.endswith("nas"):
            y[rng.random(N_OBS) < 0.2] = np.nan
        out[name] = (x, y)
    return out


@pytest.fixture(scope="session")
def grid_df(spark, grid_series, grid_pairs):
    """Long-format Spark DataFrame: one series per (variant) with row
    index i, value x, and companion y."""
    frames = []
    for name, x in grid_series.items():
        _, y = grid_pairs[name]
        frames.append(
            pd.DataFrame(
                {"series_id": name, "i": np.arange(N_OBS, dtype=np.int32), "x": x, "y": y}
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(pdf, schema="series_id string, i int, x double, y double")


def collect_all(sdf, out_col: str, n: int = N_OBS) -> dict[str, np.ndarray]:
    """Pull the output column for EVERY series in one Spark job."""
    rows = sdf.select("series_id", "i", out_col).collect()
    out: dict[str, np.ndarray] = {}
    for r in rows:
        arr = out.setdefault(r[0], np.full(n, np.nan))
        v = r[2]
        arr[r[1]] = np.nan if v is None else float(v)
    return out


def collect_series(sdf, out_col: str, series: str, n: int = N_OBS) -> np.ndarray:
    """Pull one series' output column back as a numpy array ordered by i."""
    return collect_all(sdf, out_col, n)[series]
