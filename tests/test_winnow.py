"""Winnowing fingerprints (rolling k-gram hash + window-min) vs a
pure-Python reference, plus the winnowing shared-substring guarantee
(Schleimer/Wilkerson/Aiken: any shared substring of length
>= k + window - 1 yields at least one shared fingerprint) and the
map-only plan contract."""

from __future__ import annotations

import re

import pytest

from roll_spark.datapipe.text import (
    WINNOW_K,
    WINNOW_WINDOW,
    _WINNOW_B,
    _WINNOW_M,
    winnow_fingerprints,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, ""),  # empty -> ascii [0] fallback hash
    (4, "tiny"),  # shorter than k after normalize
    (5, "abcdefgh"),  # exactly k chars -> one k-gram
    (6, "a quick brown fox jumps over me today"),  # overlaps doc 1
]


def py_winnow(t: str, k: int = WINNOW_K, w: int = WINNOW_WINDOW) -> list[int]:
    t = t.lower().replace(" ", "")
    codes = [ord(c) for c in t] if t else [0]

    def horner(cs):
        h = 0
        for c in cs:
            h = (h * _WINNOW_B + c) % _WINNOW_M
        return h

    if len(codes) < k:
        hashes = [horner(codes)]
    else:
        hashes = [horner(codes[i:i + k]) for i in range(len(codes) - k + 1)]
    if len(hashes) < w:
        mins = [min(hashes)]
    else:
        mins = [min(hashes[i:i + w]) for i in range(len(hashes) - w + 1)]
    return sorted(set(mins))


@pytest.fixture(scope="module")
def fps(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = winnow_fingerprints(df, "text", "doc_id").toPandas()
    return {d: sorted(out[out.doc_id == d].fp.tolist()) for d, _ in DOCS}


def test_matches_python_reference(fps):
    for did, text in DOCS:
        assert fps[did] == py_winnow(text), f"doc {did}"


def test_shared_substring_guarantee(fps):
    # docs 1 and 6 share "quickbrownfoxjumpsover" (22 >= k + w - 1 = 11)
    assert set(fps[1]) & set(fps[6])
    # docs 2 and 3 share nothing
    assert not set(fps[2]) & set(fps[3])


def test_short_doc_totality(fps):
    # every doc, including empty/short ones, gets >= 1 fingerprint
    assert all(len(v) >= 1 for v in fps.values())


def test_overlap_pairs_planted_contamination(spark):
    from roll_spark.datapipe.dedup import winnow_overlap_pairs

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "the shared paragraph sits right here in the middle lambda mu nu xi"),
        (2, "completely different preamble text goes first the shared paragraph "
            "sits right here in the middle and then a different tail entirely"),
        (3, "nothing in common with either of the other two documents at all"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = winnow_overlap_pairs(df, "text", "doc_id", min_shared=2).toPandas()
    assert set(map(tuple, out[["da", "db"]].values)) == {(1, 2)}
    row = out.iloc[0]
    assert row.shared_fps >= 2 and 0 < row.overlap <= 1


def test_overlap_pairs_hot_fp_cap(spark):
    from roll_spark.datapipe.dedup import winnow_overlap_pairs

    # every doc shares ONE boilerplate sentence; capping its fingerprints
    # (df > 2 of 3 docs) must remove the pairs it alone creates
    boiler = "this exact boilerplate disclaimer footer appears everywhere"
    docs = [(i, f"unique body number {i} with its own words {i} " + boiler)
            for i in range(1, 4)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    loose = winnow_overlap_pairs(df, "text", "doc_id", min_shared=2).toPandas()
    capped = winnow_overlap_pairs(df, "text", "doc_id", min_shared=2,
                                  max_fp_df=2).toPandas()
    assert len(loose) == 3  # all pairs meet through the boilerplate
    assert len(capped) < len(loose)


def test_map_only_plan(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = (
        winnow_fingerprints(df, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert not re.search(r"Exchange (?:hash|range|SinglePartition)", plan)
    assert "Sort [" not in plan
    # the hashes array must be materialized ONCE (its own projected
    # column), not inlined into the window-min lambda (O(n^2) blowup)
    assert plan.count("__hashes") >= 1
