"""Deterministic synthetic transcripts table + derived numeric series.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. Generation is pure-numpy from a fixed seed so every
test run (and the kill/resume bit-identity test) sees the same bytes.

The numeric series the engine rolls up are DERIVED, never stored:
- ``text_len``  = length(text)        (zeros from empty strings)
- ``latency_s`` = ts - lag(ts) per conversation (NULL at turn 0)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roll_spark.operators.base import ordered_window

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "bash", "edit", "fetch"])
BASE_EPOCH = pd.Timestamp("2025-01-01 00:00:00")

_WORDS = np.array(
    "the roll spark window mean sum var cov turn tool agent reply query "
    "plan trace token batch shuffle merge tier raw minute hour day".split()
)


def generate_transcripts_pdf(
    n_convs: int = 20,
    median_turns: int = 40,
    skew_factor: int = 60,
    n_skewed: int = 2,
    seed: int = 5640,
) -> pd.DataFrame:
    """Build the transcripts table as pandas (test scale).

    ``n_skewed`` conversations are ``skew_factor``x longer than the
    median — the skew tail that exercises the chunked-overlap path.
    Seed 5640 nods to the reference's own fixture seed
    (/root/reference/tests/testthat/helper-data.R:2).
    """
    rng = np.random.default_rng(seed)
    lengths = rng.integers(max(2, median_turns // 2), median_turns * 2, size=n_convs)
    for k in range(min(n_skewed, n_convs)):
        lengths[k] = median_turns * skew_factor
    rows_conv, rows_turn = [], []
    for c, ln in enumerate(lengths):
        rows_conv.append(np.full(ln, c, dtype=np.int64))
        rows_turn.append(np.arange(ln, dtype=np.int32))
    conv_num = np.concatenate(rows_conv)
    turn_idx = np.concatenate(rows_turn)
    n = len(conv_num)

    conv_id = np.char.add("conv_", conv_num.astype(str))
    role = ROLES[turn_idx % 3]

    # deterministic text: word soup of per-(conv,turn) seeded length 0..2000
    text_len_target = (rng.integers(0, 2001, size=n)).astype(np.int64)
    # ~3% empty strings -> zeros in the derived series
    text_len_target[rng.random(n) < 0.03] = 0
    word_idx = rng.integers(0, len(_WORDS), size=n)
    texts = []
    for i in range(n):
        if text_len_target[i] == 0:
            texts.append("")
            continue
        base = _WORDS[(word_idx[i] + np.arange(8)) % len(_WORDS)]
        s = " ".join(base)
        reps = int(text_len_target[i] // (len(s) + 1)) + 1
        texts.append((s + " ") * reps)
    text = np.array([t[: text_len_target[i]] for i, t in enumerate(texts)], dtype=object)

    tool = np.where(role == "tool", TOOLS[turn_idx % len(TOOLS)], None)

    # strictly increasing ts per conv: start offset + cumulative gaps 1s..3h,
    # with occasional multi-hour gaps (empty 1m/1h buckets -> gap-fill tests)
    gaps = rng.integers(1, 600, size=n).astype(np.float64)
    long_gap = rng.random(n) < 0.02
    gaps[long_gap] = rng.integers(3600, 3 * 3600, size=int(long_gap.sum()))
    ts = np.empty(n, dtype="datetime64[us]")
    pos = 0
    for c, ln in enumerate(lengths):
        start = BASE_EPOCH + pd.Timedelta(hours=int(c) * 7)
        cum = np.cumsum(gaps[pos : pos + ln])
        ts[pos : pos + ln] = (start + pd.to_timedelta(cum, unit="s")).to_numpy(
            dtype="datetime64[us]"
        )
        pos += ln

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text.astype(str),
            "tool": tool,
            "ts": ts,
        }
    )


TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def generate_transcripts(spark: SparkSession, **kw) -> DataFrame:
    pdf = generate_transcripts_pdf(**kw)
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)


def derive_series(df: DataFrame) -> DataFrame:
    """Attach the derived numeric series (text_len, latency_s).

    latency_s is NULL at turn 0 of every conversation — the NA the
    reference's min_obs/na_restore machinery must handle.
    """
    ow = ordered_window("conv_id", "turn_idx")
    return df.withColumn("text_len", F.length("text").cast("double")).withColumn(
        "latency_s",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(ow))).cast("double")
        / 1e6,
    )
