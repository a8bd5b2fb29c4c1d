"""A/B: id-pairs-only LSH candidate generation vs the round-3
vector-carrying plan.

Round 3's `lsh_topk` carried both embedding vectors through the bucket
join, the candidate `distinct` AND an eager localCheckpoint — round 4
re-joins vectors by key after candidate generation instead (the
`lsh_candidate_pairs` pattern). Wall clock on a warm single box swings
±30% between trials, so the primary metric is DETERMINISTIC: total
shuffle write bytes per variant from the Spark UI REST API. The old
variant is reimplemented inline; both are driven to the same action
(top-k count) and asserted row-identical.

Usage: python tools/ab_lsh_vectors.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_DEFAULT = 50_000
DIM = 64
K = 10
N_TABLES = 4
N_BITS = 14
SEED = 42


def _shuffle_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    return sum(s["shuffleWriteBytes"] for s in stages
               if s["status"] == "COMPLETE")


def _vectors(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: ((F.pmod(F.xxhash64(F.col("id"), d), F.lit(1000))
                        - 500).cast("double") / 100.0),
        ).alias("embedding"),
    )


def old_lsh(queries, corpus):
    """Round-3 plan: vectors ride the bucket join, the distinct and the
    eager checkpoint (reimplemented inline for the A/B)."""
    from chronominer_spark.operators.similarity import (
        _broadcast_nested,
        _hyperplane,
        _sketch_buckets,
        cosine_similarity,
    )
    from pyspark.sql import Window as W

    planes = [
        [_hyperplane(SEED, t, b, DIM) for b in range(N_BITS)]
        for t in range(N_TABLES)
    ]

    def bucketize(df, name):
        with_planes = _broadcast_nested(
            df.select(F.col("vec_id").alias(name),
                      F.col("embedding").alias(f"__{name}_v")),
            "__planes", planes, depth=3,
        )
        return with_planes.select(
            name, f"__{name}_v",
            F.explode(_sketch_buckets(f"__{name}_v", "__planes"))
            .alias("bucket"),
        )

    qb = bucketize(queries, "query_id")
    cb = bucketize(corpus, "neighbor_id")
    cand = (
        qb.join(cb, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "__query_id_v", "neighbor_id", "__neighbor_id_v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    scored = cand.withColumn(
        "cosine",
        F.round(cosine_similarity(F.col("__query_id_v"),
                                  F.col("__neighbor_id_v")), 6),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= K)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def new_lsh(queries, corpus):
    from chronominer_spark.operators.similarity import lsh_topk
    # max_bucket_size triggers the persist+checkpoint branch, matching
    # the old plan's checkpoint so the ONLY delta is what the exchange
    # and checkpoint carry
    return lsh_topk(queries, corpus, k=K, dim=DIM, n_bits=N_BITS,
                    n_tables=N_TABLES, seed=SEED,
                    max_bucket_size=1_000_000)


def run_variant(variant: str, n: int) -> None:
    from chronominer_spark.session import build_session

    spark = build_session(
        "ab_lsh", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g",
                    "spark.ui.enabled": "true"},
    )
    vecs = _vectors(spark, n).localCheckpoint(eager=True)

    walls, rows, fp, sw_delta = [], None, None, 0
    for trial in range(3):  # trial 0 = warmup
        base = _shuffle_bytes(spark)
        t0 = time.time()
        out = old_lsh(vecs, vecs) if variant == "old" else new_lsh(vecs, vecs)
        rows = out.count()
        fp = out.agg(F.bit_xor(F.xxhash64("query_id", "neighbor_id",
                                          "cosine", "rank"))).collect()[0][0]
        wall = time.time() - t0
        if trial > 0:
            walls.append(round(wall, 2))
            sw_delta = _shuffle_bytes(spark) - base
    print(json.dumps({"variant": variant, "rows": rows, "fp": fp,
                      "best_wall": min(walls),
                      "shuffle_write_mb": round(sw_delta / 1e6, 1)}))
    spark.stop()


def main() -> None:
    import subprocess
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    results = {}
    for variant in ("old", "new"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", variant,
             str(n)],
            capture_output=True, text=True, check=True,
            env={**os.environ,
                 "PYTHONPATH": os.path.dirname(os.path.dirname(
                     os.path.abspath(__file__)))},
        )
        results[variant] = json.loads(proc.stdout.strip().splitlines()[-1])
    assert results["old"]["rows"] == results["new"]["rows"]
    assert results["old"]["fp"] == results["new"]["fp"], "outputs differ!"
    print(json.dumps({
        "n_vectors": n, "identical_outputs": True,
        "old": results["old"], "new": results["new"],
        "shuffle_reduction": round(
            1 - results["new"]["shuffle_write_mb"]
            / max(results["old"]["shuffle_write_mb"], 1e-9), 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_variant(sys.argv[2], int(sys.argv[3]))
    else:
        main()
