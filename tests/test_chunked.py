"""Chunked-overlap skew path: outputs must be IDENTICAL to the
unchunked pass for every operator family, including the skewed
conversations of the transcripts fixture."""

from __future__ import annotations

import numpy as np
import pytest

from roll_spark import roll_idxmax, roll_mean, roll_median, roll_var
from roll_spark.operators.chunked import roll_chunked
from roll_spark.sources.transcripts import derive_series, generate_transcripts


@pytest.fixture(scope="module")
def tdf(spark):
    # small but skewed: 2 conversations 30x longer than the median
    df = derive_series(
        generate_transcripts(spark, n_convs=6, median_turns=30, skew_factor=30)
    )
    return df.cache()


def _collect(df, out):
    rows = df.select("conv_id", "turn_idx", out).collect()
    return {(r[0], r[1]): (None if r[2] is None else round(float(r[2]), 9)) for r in rows}


@pytest.mark.parametrize(
    "op,kw",
    [
        (roll_mean, {"min_obs": 3}),
        (roll_var, {"min_obs": 3}),
        (roll_median, {"min_obs": 1}),
        (roll_idxmax, {"min_obs": 1}),
    ],
)
def test_chunked_equals_unchunked(spark, tdf, op, kw):
    width = 7
    plain = op(tdf, "text_len", "conv_id", "turn_idx", width, out="r", **kw)
    chunked = roll_chunked(
        tdf, op, "text_len", "conv_id", "turn_idx", width,
        chunk_rows=64, out="r", **kw,
    )
    a, b = _collect(plain, "r"), _collect(chunked, "r")
    assert a.keys() == b.keys()
    diff = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not diff, f"{op.__name__}: {len(diff)} mismatches, e.g. {list(diff.items())[:3]}"


def test_chunked_row_count_preserved(spark, tdf):
    width = 7
    chunked = roll_chunked(
        tdf, roll_mean, "latency_s", "conv_id", "turn_idx", width,
        chunk_rows=64, out="r", min_obs=1,
    )
    assert chunked.count() == tdf.count()
    # per-turn text equality under stable ordering (BASELINE.json invariant)
    orig = tdf.select("conv_id", "turn_idx", "text").collect()
    after = chunked.select("conv_id", "turn_idx", "text").collect()
    assert {(r[0], r[1]): r[2] for r in orig} == {(r[0], r[1]): r[2] for r in after}
