"""Similarity search over embedding columns (array<float>).

- :func:`cosine_similarity`  pure-expression dot/norm via ``zip_with`` +
  ``aggregate`` (JVM-side, codegen; no UDF)
- :func:`brute_force_topk`   exact top-k: broadcast the (small) query set
  against the corpus, window-rank per query. The baseline and the
  verifier for the approximate path.
- :func:`lsh_topk`           approximate top-k via random-hyperplane LSH:
  sign-bit sketches bucket the corpus; candidates share a bucket in any
  of several sketch tables; verify with exact cosine inside buckets.
  Scale path: shuffle is (docs × tables) bucket keys, never the cross
  product.

Hyperplanes are generated deterministically (seeded hash expressions),
so results are reproducible at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a, b) -> F.Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca = F.transform(ca, lambda x: x.cast("double"))
    cb = F.transform(cb, lambda x: x.cast("double"))
    d = norm(ca) * norm(cb)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(ca, cb) / d)


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus. The query
    side is broadcast (it is the small side by construction); ranking
    breaks ties by neighbor id for a total order."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity(F.col("__qv"), F.col("__cv")))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplane(seed: int, table: int, bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-gaussian hyperplane component list (driver-side
    constant folded into the plan; tiny)."""
    import hashlib
    import struct
    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{table}:{bit}:{d}".encode()).digest()
        # two uniform(0,1] from the digest -> Box-Muller-lite: uniform
        # difference is symmetric and good enough for sign sketches
        u1 = (struct.unpack("<I", h[:4])[0] + 1) / 2**32
        u2 = (struct.unpack("<I", h[4:8])[0] + 1) / 2**32
        vals.append(u1 - u2)
    return vals


def sketch_bits(vec_col, planes: list[list[float]]) -> F.Column:
    """Sign-bit sketch of a vector against a plane set -> bit string."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(p)) for p in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ) >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame, corpus: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, dim: int = 16, n_tables: int = 8, n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates = corpus rows sharing any
    sketch-table bucket with the query; exact cosine + rank inside the
    candidate set. Recall grows with ``n_tables``; cost stays linear."""
    tables = [
        [_hyperplane(seed, t, b, dim) for b in range(n_bits)]
        for t in range(n_tables)
    ]

    def bucketize(df: DataFrame, name: str) -> DataFrame:
        buckets = F.array(*[
            F.concat(F.lit(f"t{t}:"), sketch_bits(vec_col, tables[t]))
            for t in range(n_tables)
        ])
        return df.select(
            F.col(id_col).alias(name),
            F.col(vec_col).alias(f"__{name}_v"),
            F.explode(buckets).alias("bucket"),
        )

    qb = bucketize(queries, "query_id")
    cb = bucketize(corpus, "neighbor_id")
    cand = (
        qb.join(cb, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "__query_id_v", "neighbor_id", "__neighbor_id_v")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", cosine_similarity(F.col("__query_id_v"), F.col("__neighbor_id_v"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_dups(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, dim: int = 16, n_tables: int = 6,
    n_bits: int = 10, seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, via the same
    hyperplane bucketing (self-join) + exact verify."""
    pairs = lsh_topk(
        df, df, id_col=id_col, vec_col=vec_col, k=50,
        dim=dim, n_tables=n_tables, n_bits=n_bits, seed=seed,
    )
    return (
        pairs.where((F.col("cosine") >= threshold)
                    & (F.col("query_id") < F.col("neighbor_id")))
        .select(F.col("query_id").alias("id_a"),
                F.col("neighbor_id").alias("id_b"), "cosine")
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, n_centroids: int = 16, n_probe: int = 3,
    sample_fraction: float = 0.2, seed: int = 42, iters: int = 3,
) -> DataFrame:
    """Approximate top-k via IVF (inverted file) partitioning.

    Train: k-means centroids on a deterministic corpus sample — the
    sample is small by construction, so Lloyd iterations run in driver
    numpy on collected vectors (training is the one deliberately
    driver-side step; assignment and search stay distributed).
    Index: each corpus vector is assigned to its nearest centroid
    (broadcast centroid table, pure expressions).
    Search: each query probes its ``n_probe`` nearest centroids and
    ranks exact cosine within those cells — cost ~ corpus/centroids ×
    n_probe per query instead of the full corpus.
    """
    import numpy as np

    sample_rows = (
        corpus.select(vec_col)
        .sample(fraction=sample_fraction, seed=seed)
        .limit(20_000)  # hard cap: training set stays driver-sized
        .collect()
    )
    x = np.array([r[vec_col] for r in sample_rows], dtype=float)
    if len(x) < n_centroids:
        n_centroids = max(1, len(x))
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), n_centroids, replace=False)]
    for _ in range(iters):
        # cosine assignment on normalized vectors
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = (xn @ cn.T).argmax(axis=1)
        for ci in range(n_centroids):
            members = x[assign == ci]
            if len(members):
                cent[ci] = members.mean(axis=0)

    def nearest_cells(vec: F.Column, top: int) -> F.Column:
        sims = F.array(*[
            F.struct(
                dot(F.transform(vec, lambda v: v.cast("double")),
                    F.array(*[F.lit(float(c)) for c in cent[ci]])).alias("s"),
                F.lit(ci).alias("cell"),
            )
            for ci in range(n_centroids)
        ])
        ordered = F.reverse(F.array_sort(sims))
        return F.slice(ordered, 1, top)

    indexed = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.element_at(nearest_cells(F.col(vec_col), 1), 1)["cell"].alias("cell"),
    )
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(
            F.transform(nearest_cells(F.col(vec_col), n_probe),
                        lambda s: s["cell"])
        ).alias("cell"),
    )
    scored = (
        probed.join(indexed, on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity(F.col("__qv"), F.col("__cv")))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
        .distinct()
    )
