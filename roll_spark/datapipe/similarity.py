"""Similarity search over embedding columns (array<float>).

- ``brute_topk``  exact cosine top-k: broadcast the (small) query set,
  JVM-side dot products via zip_with/aggregate, rank per query. The
  correctness baseline.
- ``lsh_topk``    random-hyperplane LSH: deterministic seeded
  projection matrix (broadcast literal), sign-bit bucket key, candidates
  collide on >=1 band, exact rerank inside buckets. The scale path: the
  corpus is scanned once and joined only within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in
    float64 JVM expressions (zip_with products + aggregate sums)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    vec: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbours for every query vector.

    ``queries`` is expected to be small (it is broadcast); ranking is
    (cosine desc, neighbour id asc) on the optionally-rounded cosine so
    results are reproducible across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec).alias("cv"))
    cos = cosine_expr("qv", "cv")
    if round_digits is not None:
        cos = F.round(cos + F.lit(10.0 ** (-round_digits - 1)), round_digits)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_expr(vec: str, planes: list[list[float]], band: int, rows: int) -> Column:
    """Sign-bit bucket key for one band of ``rows`` hyperplanes."""
    bits = []
    for r in range(rows):
        plane = planes[band * rows + r]
        arr = F.array(*[F.lit(float(v)) for v in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << r))
    key = bits[0]
    for b in bits[1:]:
        key = key + b
    return key


def lsh_band_keys_udf(planes: list[list[float]], bands: int, rows: int):
    """Vectorized band-key computation: ONE (batch x dim) @ (dim x planes)
    matmul per Arrow batch instead of bands*rows interpreted
    zip_with/aggregate lambdas per row (~10x less CPU at corpus scan
    time). Returns a pandas_udf producing the array of ``bands`` keys.

    Sign boundaries: matmul association can differ from a sequential
    fold by ~1 ulp, flipping a bit only when |dot| ~ 1e-16 — use this
    for threshold-verified pipelines (where candidate-set perturbation
    cannot change the verified output), and keep the fold-exact
    ``lsh_bucket_expr`` where an external replica recomputes the keys.
    """
    from pyspark.sql import types as TT
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    weights_bits = np.array([1 << r for r in range(rows)], dtype=np.int64)

    @pandas_udf(TT.ArrayType(TT.IntegerType()))
    def band_keys(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64)
        bits = (X @ P >= 0).astype(np.int64)          # (n, bands*rows)
        keys = bits.reshape(len(X), bands, rows) @ weights_bits
        return pd.Series(list(keys.astype(np.int32)))

    return band_keys


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    vec: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    round_digits: int | None = 6,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH blocking + exact rerank.

    Recall is tunable via bands x rows; candidates = corpus rows sharing
    at least one band key with the query. At 10^10 vectors the bucket
    join replaces the full cross join — the only all-pairs work left is
    within-bucket rerank.
    """
    rows = n_planes // bands
    planes = _hyperplanes(dim, n_planes, seed)

    def banded(df, id_alias, vec_alias):
        sel = df.select(F.col(id_col).alias(id_alias), F.col(vec).alias(vec_alias))
        return sel.select(
            id_alias, vec_alias,
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    lsh_bucket_expr(vec_alias, planes, b, rows).alias("key"),
                )
                for b in range(bands)
            ])).alias("bk"),
        ).select(id_alias, vec_alias, "bk.band", "bk.key")

    qb = banded(queries, "query_id", "qv")
    cb = banded(emb, "neighbor_id", "cv")
    cand = (
        cb.join(F.broadcast(qb), ["band", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    cos = cosine_expr("qv", "cv")
    if round_digits is not None:
        # round (with the boundary nudge) BEFORE ranking, like brute_topk:
        # makes (cosine, neighbor_id) ordering reproducible across engines
        cos = F.round(cos + F.lit(10.0 ** (-round_digits - 1)), round_digits)
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def seed_centroids(dim: int, n_centroids: int, seed: int = 42) -> np.ndarray:
    """Data-independent unit-norm centroids from a seeded RNG. A fixed
    random Voronoi quantizer: coarser than a fitted one, but fully
    deterministic from (dim, n, seed) alone — usable as a closed-form
    oracle target and as a cold-start quantizer before any fit."""
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((n_centroids, dim))
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def _fit_centroids(emb, vec, id_col, n_centroids, seed, sample_rows=50_000,
                   iters=10):
    """Mini k-means on a bounded DETERMINISTIC driver-side sample
    (spherical: cosine == dot on normalized vectors). The sample is the
    first ``sample_rows`` vectors by id — `orderBy(id).limit(n)` runs as
    a per-partition top-k + driver merge, never an unordered `limit`
    whose content depends on partition arrival order. The model is tiny
    (n_centroids x dim) and broadcast — corpus-size independent. (At
    10^10+ rows, thin first with a deterministic hash filter, e.g.
    pmod(xxhash64(id), corpus_rows/sample_rows) == 0, to keep the
    per-partition top-k cheap.)"""
    pdf = (
        emb.select(id_col, vec).orderBy(id_col).limit(sample_rows).toPandas()[vec]
    )
    X = np.stack(pdf.to_numpy())
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / np.linalg.norm(v)
    return C


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    vec: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """IVF ANN: partition the corpus into centroid cells (spherical
    k-means fit on a bounded deterministic sample — or a caller-supplied
    ``centroids`` matrix, e.g. ``seed_centroids`` for a data-independent
    quantizer), assign each corpus vector to its nearest cell with a
    vectorized Arrow UDF, probe each query's ``n_probe`` nearest cells,
    and exact-rerank only within probed cells. At 10^10 vectors the scan
    is one pass + a join keyed on cell id — the classic FAISS-IVF shape
    re-expressed as DataFrame ops.

    Cell assignment ranks UNNORMALIZED dot products in float64: argmax
    over cells is invariant to the per-row positive norm, and skipping
    the normalization keeps the arithmetic exactly reproducible by any
    engine computing plain double dot products.
    """
    from pyspark.sql import types as TT
    from pyspark.sql.functions import pandas_udf

    C = (np.asarray(centroids, dtype=np.float64) if centroids is not None
         else _fit_centroids(emb, vec, id_col, n_centroids, seed))
    Cb = C  # captured in the UDF closure -> shipped once per executor

    @pandas_udf(TT.IntegerType())
    def cell_of(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(X @ Cb.T, axis=1).astype(np.int32))

    @pandas_udf(TT.ArrayType(TT.IntegerType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64)
        # stable ordering: ties between cells break toward the lower
        # cell id (matches a (dot DESC, cell ASC) SQL ranking)
        order = np.argsort(-(X @ Cb.T), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec).alias("cv")
    ).withColumn("cell", cell_of(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec).alias("qv")
    ).withColumn("cell", F.explode(probe_cells(F.col("qv"))))
    cand = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    cos = cosine_expr("qv", "cv")
    if round_digits is not None:
        cos = F.round(cos + F.lit(10.0 ** (-round_digits - 1)), round_digits)
    scored = cand.select("query_id", "neighbor_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
