"""Text analysis operators: token counting, quality scoring, language
ID heuristic, document fingerprinting — all closed-form JVM expressions
(reproducible in ANSI SQL for the driver oracle; no regex dialects, no
Python)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny English stopword probe set for the n-gram language heuristic
_EN_MARKERS = [" the ", " and ", " of ", " to ", " a "]


def token_count_expr(text: Column) -> Column:
    """Whitespace token count via the length-difference identity —
    identical semantics in Spark and DuckDB (no split-dialect traps)."""
    n = F.length(text)
    spaces = n - F.length(F.regexp_replace(text, " ", ""))
    # simple single-space tokenization: tokens = spaces + 1 on non-empty
    return F.when(n == 0, F.lit(0)).otherwise(spaces + 1)


def token_stats(df: DataFrame, text: str, id_col: str) -> DataFrame:
    t = F.col(text)
    n_tokens = token_count_expr(t)
    n_chars = F.length(t)
    avg_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    penalize very short docs, extreme token lengths, and digit-heavy
    text. Formula-only so the oracle can reproduce it exactly."""
    t = F.col(text)
    n = F.length(t)
    n_tokens = token_count_expr(t)
    digits = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    digit_ratio = F.when(n > 0, digits.cast("double") / n).otherwise(F.lit(0.0))
    avg_tok = F.when(n_tokens > 0, n.cast("double") / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(n.cast("double") / 200.0, F.lit(1.0))
    tok_score = F.when((avg_tok >= 3) & (avg_tok <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    score = len_score * tok_score * (F.lit(1.0) - digit_ratio)
    return df.select(
        F.col(id_col),
        digit_ratio.alias("digit_ratio"),
        avg_tok.alias("avg_token_len"),
        score.alias("quality"),
    )


def en_marker_count_expr(text: Column) -> Column:
    """Occurrences of common-English marker words (padded matches)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    total = F.lit(0)
    for m in _EN_MARKERS:
        occ = (F.length(padded) - F.length(F.regexp_replace(padded, m, ""))) / len(m)
        total = total + occ.cast("long")
    return total


def lang_id(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """Language-ID heuristic: English marker-word density -> 'en' else
    'unk'. (A real model would be a broadcast n-gram table; the Spark
    plumbing — per-doc scoring + threshold — is identical.)"""
    t = F.col(text)
    n_tokens = token_count_expr(t)
    markers = en_marker_count_expr(t)
    density = F.when(n_tokens > 0, markers.cast("double") / n_tokens).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        markers.alias("en_markers"),
        density.alias("en_density"),
        F.when(density >= 0.01, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


# Character-trigram profiles for the model-based language ID. The
# grams are the classic most-frequent trigrams of each language from
# public frequency tables (Cavnar & Trenkle "N-Gram-Based Text
# Categorization", 1994 — the standard textcat approach); differential
# sums decide, so grams shared across languages (" de") are fine.
TRIGRAM_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of", "of "],
    "es": [" de", "de ", " la", "la ", "os ", " qu", "que", "ue ", " el", "el "],
    "de": ["der", "er ", " un", "und", "ich", "ch ", "ein", "sch", "die", "en "],
    "fr": [" le", "le ", " la", "es ", "ent", "nt ", " et", "et ", " pa", "ais"],
}


def _count_expr(padded: Column, gram: str) -> Column:
    """Non-overlapping occurrence count of a literal gram via the
    length-difference identity — byte-identical in Spark and DuckDB
    (both replace left-to-right, non-overlapping). Literal F.replace,
    not regexp_replace: no regex engine in the hot loop (40 counts/row)."""
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(gram), F.lit(""))))
        / len(gram)
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language trigram-profile hit DENSITY (hits per 100 chars)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    n = F.greatest(F.length(padded), F.lit(1))
    out = {}
    for lang, grams in TRIGRAM_PROFILES.items():
        total = F.lit(0).cast("long")
        for g in grams:
            total = total + _count_expr(padded, g)
        out[lang] = total.cast("double") * 100.0 / n
    return out


def lang_id_trigram(
    df: DataFrame, text: str, id_col: str, *, min_density: float = 0.5
) -> DataFrame:
    """Model-based language ID: score the text against each language's
    character-trigram profile (broadcast as LITERALS into the plan — at
    100 TB this is a map-only stage of pure JVM string expressions, no
    lookup join, no Python) and pick the argmax; below ``min_density``
    hits per 100 chars -> 'unk'. Ties break by the fixed profile order
    (en, es, de, fr) so results are deterministic and the DuckDB oracle
    can reproduce them closed-form.

    Accuracy vs the marker-word heuristic (``lang_id``): the heuristic
    only separates en/unk and mislabels every non-English doc; this
    classifier separates all four profiled languages — demonstrated on
    a multilingual fixture in tests/test_datapipe.py (the synthetic
    documents corpus is label-uncorrelated pseudo-text, so accuracy is
    not measurable there)."""
    t = F.col(text)
    scores = lang_scores(t)
    langs = list(TRIGRAM_PROFILES)
    best = F.greatest(*[scores[lg] for lg in langs])
    pred = F.lit("unk")
    for lg in reversed(langs):  # earlier profile wins ties
        pred = F.when((scores[lg] >= best) & (best >= min_density), F.lit(lg)).otherwise(pred)
    return df.select(
        F.col(id_col),
        *[scores[lg].alias(f"score_{lg}") for lg in langs],
        pred.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """64-bit document fingerprint: xxhash64 of the token stream plus a
    content-length salt — stable under whitespace-preserving storage,
    usable as a cheap near-exact dedup key."""
    return df.select(
        F.col(id_col),
        F.xxhash64(F.col(text), F.length(F.col(text))).alias("fingerprint"),
    )


# Winnowing fingerprint constants (Schleimer/Wilkerson/Aiken, SIGMOD'03):
# k-gram rolling hash + window-min selection. B/M chosen so the unrolled
# Horner stays in int64 on both engines: h < M (~2^31), h*B + 255 < 6e11.
WINNOW_K = 8
WINNOW_WINDOW = 4
_WINNOW_B = 257
_WINNOW_M = 2147483647  # 2^31 - 1


def _horner_expr(codes: Column, start: Column, k: int) -> Column:
    """Polynomial hash of codes[start+1 .. start+k] (1-based element_at),
    Horner-unrolled with a mod after every step — bit-identical to the
    DuckDB oracle's unrolled expression (int64 throughout, no overflow)."""
    h = F.lit(0).cast("long")
    for j in range(k):
        c = F.element_at(codes, (start + F.lit(j + 1)).cast("int")).cast("long")
        h = (h * F.lit(_WINNOW_B).cast("long") + c) % F.lit(_WINNOW_M).cast("long")
    return h


def winnow_fingerprints(
    df: DataFrame,
    text: str,
    id_col: str,
    *,
    k: int = WINNOW_K,
    window: int = WINNOW_WINDOW,
) -> DataFrame:
    """MOSS-style winnowing document fingerprints (the brief's
    "rolling hash" fingerprinting): normalize (lowercase, strip spaces),
    hash every character k-gram with a Rabin-Karp polynomial, then keep
    the min hash of each length-``window`` run of consecutive k-gram
    hashes; the distinct mins are the document's fingerprint set.
    Winnowing guarantee: any shared substring of length >= k + window - 1
    between two documents yields at least one shared fingerprint.

    Shape: one exploded (id, fp) row per distinct fingerprint.  Entirely
    JVM higher-order functions — map-only, ZERO shuffles, no Python in
    the loop; the constant-k Horner is O(k·n) per doc inside whole-stage
    codegen (the classic O(n) rolling update would need a prefix scan
    that Spark SQL can't express; at k=8 the unrolled form is faster
    than an Arrow round-trip anyway).  Short docs stay total: fewer
    k-grams than ``window`` -> min of what exists; shorter than ``k``
    -> one whole-text hash.

    Spark pitfall handled: sequence(0, m-1) is DESCENDING for m <= 0,
    so every stage is gated on its length being >= 1.
    """
    # Each stage becomes a REAL column before the next references it:
    # an array used inside a later higher-order lambda would otherwise be
    # re-evaluated once per lambda invocation (O(n^2·k) blowup — measured
    # minutes instead of seconds on 500 ×300-char docs).
    norm = F.lower(F.replace(F.col(text), F.lit(" "), F.lit("")))
    stage = df.select(
        F.col(id_col),
        F.transform(F.split(norm, ""), lambda c: F.ascii(c)).alias("__codes"),
    )
    codes = F.col("__codes")
    m = F.size(codes) - F.lit(k - 1)  # number of k-grams
    stage = stage.select(
        F.col(id_col),
        F.when(
            m >= 1,
            F.transform(F.sequence(F.lit(0), (m - 1).cast("int")),
                        lambda i: _horner_expr(codes, i, k)),
        ).otherwise(F.array(_horner_all(codes))).alias("__hashes"),
    )
    hashes = F.col("__hashes")
    nw = F.size(hashes) - F.lit(window - 1)  # number of winnow windows
    mins = (
        F.when(nw >= 1,
               F.transform(F.sequence(F.lit(0), (nw - 1).cast("int")),
                           lambda i: F.array_min(F.slice(hashes, (i + 1).cast("int"),
                                                         window))))
        .otherwise(F.array(F.array_min(hashes)))
    )
    return stage.select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp")
    )


def _horner_all(codes: Column) -> Column:
    """Whole-text polynomial hash for docs shorter than k: a left fold
    over the full code array (same B/M arithmetic as the k-gram hash)."""
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, c: (h * F.lit(_WINNOW_B).cast("long") + c.cast("long"))
        % F.lit(_WINNOW_M).cast("long"),
    )


BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count_expr(text: Column) -> Column:
    """BPE-ish token count: alphabetic runs, digit runs, and single
    non-alphanumeric marks each count as one token — the pre-merge
    word-split shape of GPT-style BPE tokenizers, as a countable regex
    identical in Spark and DuckDB (no lookaheads, no \\s dialects)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def bpe_token_stats(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """Per-doc whitespace vs BPE-ish token counts + their ratio (a cheap
    tokenizer-cost estimator for training-data budgeting)."""
    t = F.col(text)
    ws = token_count_expr(t)
    bpe = bpe_token_count_expr(t)
    return df.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.when(ws > 0, bpe.cast("double") / ws).otherwise(F.lit(0.0)).alias("bpe_per_ws"),
    )


# ---------------------------------------------------------------------------
# corpus-level aggregates: the statistics a training-data pipeline
# computes OVER the corpus (stop-lists, df/idf tables, top n-grams)
# rather than per document — so caps like ngram_jaccard_pairs'
# max_shingle_df come from the data instead of a constant.
# ---------------------------------------------------------------------------


def word_ngrams_expr(text: Column, n: int) -> Column:
    """Array of word n-grams (NON-distinct, corpus-count semantics) via
    the same linear zip_with fold as dedup.shingles — one fused array
    walk, no per-gram lambda/element_at (9x faster, see shingles)."""
    tok = F.split(text, " ")
    glen = F.size(tok) - (n - 1)
    grams = F.slice(tok, 1, F.greatest(glen, F.lit(0)))
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(tok, k + 1, F.greatest(glen, F.lit(0))),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    # docs shorter than n tokens contribute no grams (empty array, not
    # an ANSI negative-length slice error)
    return F.when(glen > 0, grams).otherwise(F.array().cast("array<string>"))


def corpus_top_ngrams(
    df: DataFrame, text: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Top-k word n-grams across the WHOLE corpus by occurrence count
    (ties broken by n-gram text, so the cut is deterministic).

    Plan shape: explode -> hash aggregate with MAP-SIDE partial
    aggregation (the shuffle carries one row per distinct gram per
    partition, not one per occurrence) -> TakeOrderedAndProject (each
    task keeps a k-row heap; the driver merges P heaps). No global sort
    is ever materialized — at 100 TB the full gram histogram never
    lands on one node, only P*k candidate rows do."""
    grams = word_ngrams_expr(F.col(text), n)
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


def corpus_doc_freq(
    df: DataFrame, text: str, id_col: str, *, min_df: int = 1
) -> DataFrame:
    """Document-frequency + smoothed IDF table over the corpus
    vocabulary: (token, df_docs, idf) for tokens appearing in at least
    ``min_df`` documents. idf = ln((1 + N) / (1 + df)) + 1 — the
    sklearn smooth_idf form, never divides by zero, defined even for
    an empty corpus slice.

    Per-doc dedup happens INSIDE the row (array_distinct before the
    explode), so the aggregate input is already (doc, token)-unique —
    no DISTINCT shuffle. N comes from a 1-row broadcast aggregate
    cross-joined in (BroadcastNestedLoopJoin over one row), keeping the
    whole computation in the plan: no driver round-trip, resumable,
    and the scan of ``df`` is shared by both sides under AQE."""
    toks = df.select(
        F.explode(F.array_distinct(F.split(F.col(text), " "))).alias("token")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    out = freq.crossJoin(F.broadcast(n_docs))
    idf = F.log((1.0 + F.col("__n_docs")) / (1.0 + F.col("df_docs"))) + F.lit(1.0)
    return (
        out.filter(F.col("df_docs") >= int(min_df))
        .select("token", "df_docs", idf.alias("idf"))
    )


def doc_tfidf_topk(
    df: DataFrame, text: str, id_col: str, *, k: int = 5
) -> DataFrame:
    """Top-k terms per document by tf-idf (tf = raw in-doc count, idf =
    the smoothed corpus table from corpus_doc_freq). Returns
    (id, token, tf, tfidf, rnk).

    Determinism contract for cross-engine comparison: idf is rounded to
    6 decimals BEFORE the product, so the ranking key tf * idf6 is the
    product of identical float64s on any engine — ulp differences in
    ln() can never flip a rank. Ties break by token text.

    Plan shape: tf = one hash aggregate on (doc, token); join to the
    vocab-sized df/idf table on token (AQE broadcasts it when small —
    vocabularies are ~10^6 rows even at 100 TB corpus scale); top-k per
    doc is a rank window, where Spark pushes a partial WindowGroupLimit
    below the exchange so each map task emits at most k rows per doc."""
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text), " ")).alias("token"),
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = corpus_doc_freq(df, text, id_col).select(
        "token", F.round(F.col("idf") + F.lit(1e-7), 6).alias("idf6")
    )
    j = tf.join(idf, "token")
    score = F.col("tf") * F.col("idf6")
    w = Window.partitionBy(id_col).orderBy(F.desc(score), F.asc("token"))
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
        .select(id_col, "token", "tf",
                F.round(score + F.lit(1e-7), 6).alias("tfidf"), "rnk")
    )
