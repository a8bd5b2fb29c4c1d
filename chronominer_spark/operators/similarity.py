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
