"""A/B: size-bound verify prefilter vs verify-everything for the
LSH→exact-Jaccard pipeline (q19's shape; round-5 verdict item 8).

``|A∩B| ≤ min(|A|,|B|)`` means a candidate pair whose shingle-count
ratio is below the output threshold can never qualify — the prefilter
drops it before the exploded-shingle intersection join, reading only
two size ints. Both variants run the identical upstream
(shingle-once → signatures → band join) and the identical final filter
(jaccard ≥ 0.2); the A/B asserts their OUTPUT ROWS IDENTICAL and
reports wall + total shuffle-write bytes (the deterministic metric —
single-box wall swings ±30% between trials).

Note on the originally-proposed signature-estimated band: with 16
minhashes the agreement estimate has σ≈0.1 at j=0.2, so a band tight
enough to save work misdecides pairs and a safe band verifies nearly
everything — the size bound is exact and free, so it is the shipped
prefilter (see ngram_jaccard_pairs docstring).

Usage: python tools/ab_jaccard_sizefilter.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _shuffle_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    return sum(s["shuffleWriteBytes"] for s in stages
               if s["status"] == "COMPLETE")


def _pipeline(spark, sf_dir: str, min_jaccard: float | None):
    from pyspark import StorageLevel

    from chronominer_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingle_docs,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .repartition(spark.sparkContext.defaultParallelism)
    sh = shingle_docs(d, "doc_id", "text", k=3) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(d, "doc_id", "text", k=3, num_hashes=16,
                              shingles_df=sh)
    pairs = lsh_candidate_pairs(sigs, "doc_id", bands=8, num_hashes=16)
    verified = ngram_jaccard_pairs(d, "doc_id", "text", pairs, k=3,
                                   shingles_df=sh, min_jaccard=min_jaccard)
    out = verified.where(F.col("jaccard") >= 0.2).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    rows = sorted(map(tuple, out.collect()))
    sh.unpersist()
    return rows


def main() -> None:
    from chronominer_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(
        "ab_jaccard_sizefilter", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g",
                    "spark.ui.enabled": "true"},
    )
    _pipeline(spark, sf_dir, None)  # warmup (JIT + page cache), discarded

    results = {}
    rows = {}
    for name, mj in (("verify_all", None), ("size_prefilter", 0.2)):
        base_sw = _shuffle_bytes(spark)
        t0 = time.time()
        rows[name] = _pipeline(spark, sf_dir, mj)
        wall = time.time() - t0
        results[name] = {
            "wall_sec": round(wall, 3),
            "shuffle_write_mb": round((_shuffle_bytes(spark) - base_sw) / 1e6, 1),
            "out_rows": len(rows[name]),
        }
        print(f"  {name}: {results[name]}", file=sys.stderr)
    spark.stop()

    assert rows["verify_all"] == rows["size_prefilter"], \
        "prefiltered output differs from verify-everything output"
    results["identical_output"] = True
    results["shuffle_reduction"] = round(
        1 - results["size_prefilter"]["shuffle_write_mb"]
        / max(results["verify_all"]["shuffle_write_mb"], 1e-9), 3)
    print(json.dumps({"sf_dir": sf_dir, "ab": results}))


if __name__ == "__main__":
    main()
