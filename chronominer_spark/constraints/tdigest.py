"""Mergeable t-digest quantile sketches as pandas/Arrow UDAFs.

The north-star spec calls for "quantiles via t-digest in pandas/Arrow
UDAFs" alongside the builtin ``percentile_approx``. This implements the
A3 partial+final combiner pattern (``/root/reference/eval/metrics.py:
622-674``) for quantile state:

1. **partial**: one t-digest per (partition, Spark task chunk) built in
   vectorized numpy inside ``applyInPandas`` — only centroid arrays
   (≤ ``max_centroids`` rows each) leave the executors;
2. **final**: digests merge per partition (associative, order-made-
   deterministic by sorting centroid means before compression), then
   quantiles are interpolated from the merged digest.

The digest is a standard scaled-compression t-digest: sorted centroids
greedily merged under the k-scale size limit q(1-q)·δ — deterministic
given the same input multiset, which keeps per-partition observed values
parallelism-invariant (unlike ``percentile_approx`` whose GK-sketch
merge is partition-order sensitive).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _compress(means: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted centroids under the t-digest k-scale bound."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    cum = 0.0
    cur_m, cur_w = means[0], weights[0]
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + cur_w / 2.0) / total
        limit = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= max(limit, 1.0):
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Interpolated quantile from centroid (mean, weight) arrays."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    target = q * total
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    idx = np.searchsorted(cum, target)
    lo, hi = idx - 1, idx
    frac = (target - cum[lo]) / (cum[hi] - cum[lo])
    return float(means[lo] + frac * (means[hi] - means[lo]))


def tdigest_quantiles(
    df: DataFrame,
    partition_col: str,
    value_expr: str,
    qs: list[float],
    delta: int = 200,
) -> DataFrame:
    """Per-partition quantiles via two-stage t-digest.

    Returns (partition, q, value) with one row per requested quantile.
    Shuffle volume: ≤ delta centroids per (partition, input-split) —
    independent of row count, the property that makes this viable at
    10^12 rows where exact percentiles cannot buffer values.
    """
    vals = df.select(
        F.col(partition_col).alias("part"),
        F.expr(value_expr).cast("double").alias("v"),
        F.spark_partition_id().alias("_split"),
    ).where(F.col("v").isNotNull())

    partial_schema = "part string, means array<double>, weights array<double>"

    def build_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["v"].to_numpy(dtype=float)
        m, w = _compress(v, np.ones_like(v), delta)
        return pd.DataFrame({
            "part": [pdf["part"].iloc[0]],
            "means": [m.tolist()],
            "weights": [w.tolist()],
        })

    partials = (
        vals.withColumn("part", F.col("part").cast("string"))
        .groupBy("part", "_split")
        .applyInPandas(build_partial, partial_schema)
    )

    final_schema = "part string, q double, value double"
    qs_arr = list(qs)

    def merge_final(pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate([np.asarray(x) for x in pdf["means"]])
        weights = np.concatenate([np.asarray(x) for x in pdf["weights"]])
        m, w = _compress(means, weights, delta)
        return pd.DataFrame({
            "part": pdf["part"].iloc[0],
            "q": qs_arr,
            "value": [_quantile(m, w, q) for q in qs_arr],
        })

    return partials.groupBy("part").applyInPandas(merge_final, final_schema)
