"""A/B: round-5 heavy_hitters (mapInPandas, vectorized chunked
value_counts fold) vs the round-4 plan (groupBy(_split).applyInPandas
with a per-item Python dict loop).

Two defects in the old shape, both flagged by round-4 ADVICE/VERDICT:
(1) the groupBy(_split) hash exchange shuffled the ENTIRE stream, not
just the <= k-row partials the docstring promised; (2) the per-split
MG pass iterated `pdf["item"].tolist()` item-by-item at Python rate —
the pipeline's only Python-rate full-data scan. The new plan fuses the
per-partition fold into the scan stage (no exchange of the stream) and
counts each Arrow chunk via pandas `value_counts()`.

Metrics, per the house discipline (wall swings ±30% between trials on
this host): the primary deltas are DETERMINISTIC — total shuffle write
bytes from the Spark UI REST API (old shuffles the stream, new does
not) — plus warm wall clock for the CPU-rate claim. Both variants are
driven to the same action and their MG contract verified against exact
counts (MG summaries are partition-order-dependent, so the two
variants' item sets may legitimately differ inside the contract band;
the contract itself is the identity that matters).

Usage: python tools/ab_heavy_hitters.py [n_rows]

Measured 2026-08-18, local[32], warm second trial, 20M rows:

High-cardinality tail (~10M distinct cold keys + 2 hot keys — the
regime where MG actually evicts per item):
  old  groupBy-applyInPandas : 5.54 s wall, 131.1 MB shuffle write
  new  mapInPandas fold      : 4.37 s wall,   0.0 MB shuffle write
  -> 1.27x wall, stream exchange ELIMINATED (-100% shuffle bytes).

Low-cardinality tail (997 distinct keys — dict loop cache-hot, its
best case): old 2.88 s / 15.5 MB vs new 3.54 s / 0.0 MB — wall parity
(0.81x, within this host's documented swing), shuffle still -100%.

The deterministic metric (shuffle bytes) is the scale claim: at 100 TB
the old plan moved the whole stream across one exchange and pinned
each split in one pandas frame; the new plan moves <= k rows per
partition and holds O(k + chunk_rows) per task. Wall is secondary and
honest: parity-to-1.3x single-box, cardinality-dependent. MG contract
(coverage + bound vs exact counts) held by both variants in both
regimes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_DEFAULT = 20_000_000
K = 16


def _shuffle_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    return sum(s["shuffleWriteBytes"] for s in stages
               if s["status"] == "COMPLETE")


def _stream(spark, n: int):
    """Skewed item stream: two planted hot keys (~20% / ~13%) over a
    ~1k-key cold tail — the hot-key-scout workload MG exists for."""
    return spark.range(n).select(
        F.when(F.col("id") % 5 == 0, F.lit("hot_a"))
        .when(F.col("id") % 6 == 0, F.lit("hot_b"))
        .otherwise(F.concat(F.lit("u"), (F.pmod(F.xxhash64("id"),
                                                F.lit(10_000_000)))
                   .cast("string")))
        .alias("item")).repartition(32)


def old_heavy_hitters(df, col, k):
    """Round-4 plan, reimplemented inline for the A/B: hash exchange on
    spark_partition_id, whole split as ONE pandas frame, per-item dict
    loop."""
    from chronominer_spark.operators.sketches import _mg_compress

    vals = (df.select(F.col(col).cast("string").alias("item"))
            .where(F.col("item").isNotNull())
            .withColumn("_split", F.spark_partition_id()))

    def _mg_stream(items, cap):
        counts = {}
        for it in items:
            if it in counts:
                counts[it] += 1
            elif len(counts) < cap:
                counts[it] = 1
            else:
                dead = [i for i in counts if counts[i] == 1]
                for i in counts:
                    counts[i] -= 1
                for i in dead:
                    del counts[i]
        return counts

    def partial(pdf):
        counts = _mg_stream(pdf["item"].tolist(), k)
        return pd.DataFrame(
            {"item": list(counts), "cnt": list(counts.values())})

    def final(pdf):
        counts = _mg_compress(pdf.groupby("item")["cnt"].sum().to_dict(), k)
        return pd.DataFrame(
            {"item": list(counts), "est_count": list(counts.values())})

    return (vals.groupBy("_split").applyInPandas(partial, "item string, cnt long")
            .withColumn("_one", F.lit(1)).groupBy("_one")
            .applyInPandas(final, "item string, est_count long"))


def check_contract(rows, exact: dict, n: int, k: int, tag: str):
    est = {r["item"]: r["est_count"] for r in rows}
    assert len(est) <= k, (tag, len(est))
    for it, c in exact.items():
        if c * (k + 1) > n:
            assert it in est, (tag, "missing heavy item", it)
        if it in est:
            assert est[it] <= c, (tag, it, est[it], c)
            assert (c - est[it]) * (k + 1) <= n, (tag, it, est[it], c)
    print(f"  {tag}: MG contract ok ({len(est)} items)")


def main() -> None:
    from chronominer_spark.operators.sketches import heavy_hitters
    from chronominer_spark.session import build_session

    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    spark = build_session(
        "ab_heavy_hitters",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "24g",
                    "spark.ui.enabled": "true"},
    )
    src = _stream(spark, n).localCheckpoint()  # freeze input, exclude gen cost
    exact = {r["item"]: r["cnt"] for r in
             src.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
             .collect()}

    results = {}
    for tag, fn in (("old_groupby_loop", old_heavy_hitters),
                    ("new_mapinpandas", heavy_hitters)):
        for trial in ("cold", "warm"):
            sb0 = _shuffle_bytes(spark)
            t0 = time.time()
            rows = fn(src, "item", K).collect()
            wall = time.time() - t0
            sbytes = _shuffle_bytes(spark) - sb0
            print(f"{tag} [{trial}]: {wall:.2f} s wall, "
                  f"{sbytes / 1e6:.2f} MB shuffle write")
            results[tag] = {"wall_warm": wall, "shuffle_bytes": sbytes}
        check_contract(rows, exact, n, K, tag)

    o, nw = results["old_groupby_loop"], results["new_mapinpandas"]
    print(json.dumps({
        "n": n, "k": K,
        "old_wall_warm_s": round(o["wall_warm"], 2),
        "new_wall_warm_s": round(nw["wall_warm"], 2),
        "speedup": round(o["wall_warm"] / nw["wall_warm"], 2),
        "old_shuffle_mb": round(o["shuffle_bytes"] / 1e6, 2),
        "new_shuffle_mb": round(nw["shuffle_bytes"] / 1e6, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
