"""Deduplication operators for training-data pipelines.

All-JVM implementations (built-in functions only — no Python in the hot
path): exact hash dedup, n-gram Jaccard pairs, MinHash+LSH banding,
SimHash, and embedding-cosine near-dup. The reference package has no
dedup surface; these are the scale ops a 100 TB text corpus needs
(SURVEY.md §2.3 extension).

Scale notes per op are inline; the common theme is: never materialize
the full pair matrix — go through shingle/band/bucket inverted joins so
the join key carries the blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """One row per distinct text: (text_md5, keep_id = min id, n_copies).

    Plain hash groupBy — Catalyst does partial aggregation map-side, so
    the shuffle carries one row per distinct digest per partition.
    """
    return (
        df.groupBy(F.md5(F.col(text)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingles(df: DataFrame, text: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document, all in JVM expressions:
    split -> transform over an index sequence -> array_distinct -> explode."""
    tok = F.split(F.col(text), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tok) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(tok, i + k + 1) for k in range(n)]),
    )
    return (
        df.filter(F.size(tok) >= n)
        .select(F.col(id_col).alias("doc"), F.explode(F.array_distinct(grams)).alias("sh"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    *,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact Jaccard near-dup pairs over word n-gram shingle sets.

    Inverted-index self-join on the shingle (docs sharing zero shingles
    never meet), then |A∩B| via count and |A∪B| = |A|+|B|-|A∩B|.
    At scale the shingle join is the blocker: frequency-cap hot shingles
    (stop-gram removal) before joining if the corpus is pathological.
    """
    sh = shingles(df, text, id_col, n).cache()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("nsh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("da"), F.col("b.doc").alias("db"))
        .agg(F.count("*").alias("common"))
    )
    sx = sizes.alias("sx")
    sy = sizes.alias("sy")
    jac = (
        common.join(sx, F.col("da") == F.col("sx.doc"))
        .join(sy, F.col("db") == F.col("sy.doc"))
        .select(
            "da", "db",
            (F.col("common").cast("double")
             / (F.col("sx.nsh") + F.col("sy.nsh") - F.col("common"))).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def minhash_signatures(
    df: DataFrame, text: str, id_col: str, *, n_hashes: int = 32, n: int = 3
) -> DataFrame:
    """MinHash signature per doc: k independent hash functions simulated
    as xxhash64(shingle || salt_i); signature_i = min over shingles.
    One explode + one groupBy with k min-aggregates — fully JVM-side."""
    sh = shingles(df, text, id_col, n)
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}") for i in range(n_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text: str,
    id_col: str,
    *,
    n_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """MinHash + LSH banding candidate pairs, optionally verified.

    Signatures are split into ``bands`` bands of ``n_hashes/bands`` rows;
    docs colliding in ANY band become candidates (classic S-curve
    blocking). Candidates are optionally verified with exact shingle
    Jaccard. Only candidates ever join — the full pair space is never
    touched, which is the property that survives 10^10 docs.
    """
    if n_hashes % bands:
        raise ValueError("bands must divide n_hashes")
    rows = n_hashes // bands
    sig = minhash_signatures(df, text, id_col, n_hashes=n_hashes, n=n)
    band_cols = [
        F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)], F.lit(b)).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("doc", *band_cols)
    stacked = banded.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("sig"))
                for b in range(bands)
            ])
        ).alias("bs"),
    ).select("doc", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    l = stacked.alias("l")
    r = stacked.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.sig") == F.col("r.sig"))
               & (F.col("l.doc") < F.col("r.doc")))
        .select(F.col("l.doc").alias("da"), F.col("r.doc").alias("db"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    exact = ngram_jaccard_pairs(df, text, id_col, n=n, threshold=verify_threshold)
    return cand.join(exact, ["da", "db"], "inner")


def simhash(df: DataFrame, text: str, id_col: str, *, bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per token a 64-bit hash votes ±1 on each of
    ``bits`` positions; the sign vector packs into one long.

    Implemented as explode(tokens) -> groupBy(doc) with ``bits`` sum
    aggregates over bit tests — shuffles one row per (doc, token) and
    aggregates map-side first.
    """
    tok = F.explode(F.split(F.col(text), " ")).alias("tok")
    base = df.select(F.col(id_col).alias("doc"), tok).filter(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = base.groupBy("doc").agg(*votes)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select("doc", fp.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame, text: str, id_col: str, *, bits: int = 32, max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded so candidates
    collide on at least one exact byte-band (pigeonhole: hamming <= 3
    over 4 bands guarantees one identical band)."""
    fp = simhash(df, text, id_col, bits=bits).cache()
    width = bits // bands
    mask = (1 << width) - 1
    stacked = fp.select(
        "doc", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for b in range(bands)
        ])).alias("bk"),
    ).select("doc", "simhash", "bk.band", "bk.key")
    l, r = stacked.alias("l"), stacked.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.key") == F.col("r.key"))
               & (F.col("l.doc") < F.col("r.doc")))
        .select(F.col("l.doc").alias("da"), F.col("r.doc").alias("db"),
                F.col("l.simhash").alias("ha"), F.col("r.simhash").alias("hb"))
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("da", "db", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_neardup_pairs(
    emb: DataFrame, vec: str, id_col: str, *, threshold: float = 0.9
) -> DataFrame:
    """Exact cosine near-dup pairs (brute force; the LSH-bucketed variant
    lives in datapipe.similarity for the scale path)."""
    from roll_spark.datapipe.similarity import cosine_expr

    a = emb.select(F.col(id_col).alias("da"), F.col(vec).alias("va"))
    b = emb.select(F.col(id_col).alias("db"), F.col(vec).alias("vb"))
    pairs = a.join(b, F.col("da") < F.col("db"))
    return pairs.select(
        "da", "db", cosine_expr("va", "vb").alias("cosine")
    ).filter(F.col("cosine") >= threshold)
