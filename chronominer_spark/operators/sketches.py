"""Mergeable frequency sketches: Misra–Gries heavy hitters.

The hot-key primitive a 100-TB validation/curation pipeline needs
before it commits to a shuffle: which conv_ids / domains / tokens are
heavy enough to warrant salting, quarantine, or a dedicated partition.
Exact top-k via groupBy is itself a full shuffle of every distinct key;
the Misra–Gries summary shuffles at most ``k`` rows per input split —
size-oblivious, like the t-digest family (constraints/tdigest.py).

Guarantee (Misra–Gries 1982; mergeability per Agarwal et al. 2012,
"Mergeable Summaries", PODS): with capacity ``k`` over a stream of
``n`` items, every item with true count > n/(k+1) appears in the
summary, and every estimate satisfies
``true − n/(k+1) ≤ est ≤ true`` — the bound survives the two-level
partial/final merge used here (pointwise sum, then subtract the
(k+1)-th largest and drop non-positives).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_compress(counts: dict, k: int) -> dict:
    """Shrink a counter to ≤ k entries, MG-style: subtract the
    (k+1)-th largest count from every entry and drop non-positives."""
    if len(counts) <= k:
        return counts
    cut = sorted(counts.values(), reverse=True)[k]
    return {it: c - cut for it, c in counts.items() if c > cut}


def _mg_stream(items, k: int) -> dict:
    counts: dict = {}
    for it in items:
        if it in counts:
            counts[it] += 1
        elif len(counts) < k:
            counts[it] = 1
        else:
            dead = [i for i in counts if counts[i] == 1]
            for i in counts:
                counts[i] -= 1
            for i in dead:
                del counts[i]
    return counts


def heavy_hitters(
    df: DataFrame, col: str, k: int = 8,
) -> DataFrame:
    """Misra–Gries heavy-hitter summary of ``col`` (cast to string;
    nulls skipped). Returns ≤ k rows ``(item, est_count)``.

    Two-stage plan: one MG pass per input split (Arrow-batched
    ``applyInPandas``, whole-split group), then one merge of the ≤
    k·splits partial rows (pointwise sum + MG compress) — the only
    exchanges are the tiny partial summaries, never the stream."""
    vals = (
        df.select(F.col(col).cast("string").alias("item"))
        .where(F.col("item").isNotNull())
        .withColumn("_split", F.spark_partition_id())
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = _mg_stream(pdf["item"].tolist(), k)
        return pd.DataFrame(
            {"item": list(counts), "cnt": list(counts.values())})

    partials = vals.groupBy("_split").applyInPandas(
        partial, "item string, cnt long")

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = _mg_compress(
            pdf.groupby("item")["cnt"].sum().to_dict(), k)
        return pd.DataFrame(
            {"item": list(counts), "est_count": list(counts.values())})

    return (
        partials.withColumn("_one", F.lit(1))
        .groupBy("_one")
        .applyInPandas(final, "item string, est_count long")
    )
