"""A/B: IncrementalNearDup state compaction under a cross-batch hot
bucket (round-6 verdict item 3).

Feeds N micro-batches, each carrying `hot_per_batch` IDENTICAL
boilerplate docs (all land in the same 4 band buckets, growing the
bucket across batches) plus unique filler docs. Without maintenance,
the new-vs-state join emits O(hot_state) pairs per batch — quadratic
cumulative emission; with `compact(max_bucket_size)` every
`compact_every` batches, the hot bucket is dropped loudly once it
crosses the cap and per-batch emission stays bounded.

Usage: python tools/ab_neardup_compaction.py [n_batches] [hot_per_batch]
Prints one JSON line with per-batch pair emissions and walls for both
variants.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, n_batches: int, hot_per_batch: int, compact_every: int | None):
    from chronominer_spark.streaming.dedup_stream import IncrementalNearDup

    root = tempfile.mkdtemp(prefix="cm_nd_ab_")
    inc = IncrementalNearDup(spark, root, "doc_id", "text",
                             k=3, num_hashes=16, bands=4)
    emitted, walls = [], []
    prev = 0
    for b in range(n_batches):
        hot = spark.range(hot_per_batch).select(
            (F.col("id") + 1_000_000 + b * hot_per_batch).alias("doc_id"),
            F.lit("the same boilerplate text repeated in every batch "
                  "of this stream forever").alias("text"))
        # fillers must share NO shingles (within or across batches):
        # every token carries the doc's global id
        gid = (F.col("id") + b * 200).cast("string")
        filler = spark.range(200).select(
            (F.col("id") + b * 200).alias("doc_id"),
            F.concat_ws(
                " ", *[F.concat(F.lit(f"t{j}x"), gid) for j in range(8)]
            ).alias("text"))
        t0 = time.time()
        inc.process_batch(hot.unionByName(filler), b)
        walls.append(round(time.time() - t0, 2))
        n = inc.result().count()
        emitted.append(n - prev)
        prev = n
        if compact_every and (b + 1) % compact_every == 0:
            inc.compact(max_bucket_size=3 * hot_per_batch)
    segs = len(inc.buckets._segments())
    shutil.rmtree(root, ignore_errors=True)
    return {"emitted_per_batch": emitted, "batch_walls": walls,
            "state_segments": segs, "total_pairs": prev}


def main() -> None:
    from chronominer_spark.session import build_session

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hot = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = build_session("nd_compact_ab", master="local[8]",
                          shuffle_partitions=8,
                          extra_conf={"spark.driver.memory": "8g"})
    out = {
        "append_only": run(spark, n_batches, hot, compact_every=None),
        "compact_every_2": run(spark, n_batches, hot, compact_every=2),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
