"""Fuzzy entry matching — the reference's similarity join (J1).

Re-expresses greedy best-match alignment of ground-truth vs hypothesis
entries (``/root/reference/eval/metrics.py:448-492``): candidates score
by normalized Levenshtein over configured key fields (threshold 0.85,
case-insensitive, ws-normalized — ``eval/eval_config.yaml:140-168``),
and each hypothesis entry is consumed at most once (greedy 1:1 by
descending score).

Spark plan: block on an equi-join key (cheap high-recall blocking —
e.g. the chunk/turn the entries came from) so candidate generation is a
hash join, score candidates with the JVM ``levenshtein`` builtin, then
resolve the greedy 1:1 assignment per block in ``applyInPandas`` (the
assignment is sequential by definition; blocks are small). Never O(n²)
across the corpus — only within blocks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronominer_spark.functions.text import levenshtein_ratio, normalize_text


def fuzzy_match(
    gt: DataFrame,
    hyp: DataFrame,
    block_cols: list[str],
    text_col: str,
    threshold: float = 0.85,
    gt_id: str = "gt_id",
    hyp_id: str = "hyp_id",
) -> DataFrame:
    """Greedy 1:1 fuzzy alignment within blocks.

    Returns (block_cols..., gt_id, hyp_id, score) — one row per matched
    pair, each gt and each hyp used at most once, pairs chosen in
    descending score order (ties broken by (gt_id, hyp_id) for a
    deterministic result at any parallelism).
    """
    g = gt.select(
        *block_cols, F.col(gt_id),
        normalize_text(F.col(text_col)).alias("__g_norm"),
    )
    h = hyp.select(
        *block_cols, F.col(hyp_id),
        normalize_text(F.col(text_col)).alias("__h_norm"),
    )
    cand = (
        g.join(h, on=block_cols, how="inner")
        .withColumn("score", levenshtein_ratio(F.col("__g_norm"), F.col("__h_norm")))
        .where(F.col("score") >= threshold)
        .select(*block_cols, gt_id, hyp_id, F.round("score", 6).alias("score"))
    )

    out_schema = ", ".join(
        [f"`{c}` string" for c in block_cols]
        + [f"`{gt_id}` long", f"`{hyp_id}` long", "score double"]
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["score", gt_id, hyp_id], ascending=[False, True, True],
            kind="mergesort",
        )
        used_g: set = set()
        used_h: set = set()
        keep = []
        for row in pdf.itertuples(index=False):
            gid = getattr(row, gt_id)
            hid = getattr(row, hyp_id)
            if gid in used_g or hid in used_h:
                continue
            used_g.add(gid)
            used_h.add(hid)
            keep.append(row)
        return pd.DataFrame(keep, columns=pdf.columns).astype(pdf.dtypes)

    cand_str = cand
    for c in block_cols:
        cand_str = cand_str.withColumn(c, F.col(c).cast("string"))
    return cand_str.groupBy(*block_cols).applyInPandas(greedy, out_schema)
