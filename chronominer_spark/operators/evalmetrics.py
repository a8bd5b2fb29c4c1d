"""Evaluation metrics: field-level TP/FP/FN and precision/recall/F1.

Re-expresses the reference's evaluation engine (SURVEY.md §2.4 A1–A3):

- conditional TP/FP/FN counting per field (``eval/metrics.py:567-618``):
  matched & equal -> TP; hypothesis non-null & wrong -> FP; ground truth
  non-null & missed -> FN; null==null is a match (F16 null-safe equality,
  ``eval/metrics.py:290-306`` == Spark ``eqNullSafe``).
- guarded ratio metrics with macro and micro aggregation
  (``eval/metrics.py:25-60,120-168``).
- the partial+final combiner (``eval/metrics.py:622-674``) is exactly
  Spark's hash-aggregate partial/final split — ``groupBy().sum`` over
  conditional counts gives it for free at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def field_metrics(
    hyp: DataFrame,
    gt: DataFrame,
    keys: list[str],
    fields: list[str],
    round_to: int = 6,
    fuzzy_fields: dict[str, float] | None = None,
) -> DataFrame:
    """Per-field TP/FP/FN + precision/recall/F1 over key-aligned rows.

    Returns one row per field: (field, tp, fp, fn, precision, recall, f1).
    Unmatched hypothesis rows count their non-null fields as FP; unmatched
    ground-truth rows count theirs as FN (the both-ways counting of
    unmatched entries in A1).

    ``fuzzy_fields`` maps a (text) field name to a similarity threshold:
    the field matches when the normalized Levenshtein ratio of the
    ws-collapsed lowercased values is >= the threshold — the reference's
    text-field matching (``eval/metrics.py:448-492``, threshold 0.85 /
    case-insensitive / ws-normalized per ``eval/eval_config.yaml:140-168``).
    null == null still matches; null vs non-null never does.
    """
    from chronominer_spark.functions.text import levenshtein_ratio, normalize_text

    fuzzy_fields = fuzzy_fields or {}
    h = hyp.select(*keys, *[F.col(f).alias(f"__h_{f}") for f in fields]) \
           .withColumn("__has_h", F.lit(1))
    g = gt.select(*keys, *[F.col(f).alias(f"__g_{f}") for f in fields]) \
          .withColumn("__has_g", F.lit(1))
    j = h.join(g, on=keys, how="full_outer")

    aggs = []
    for f in fields:
        hv, gv = F.col(f"__h_{f}"), F.col(f"__g_{f}")
        if f in fuzzy_fields:
            eq = (hv.isNull() & gv.isNull()) | (
                hv.isNotNull() & gv.isNotNull()
                & (levenshtein_ratio(normalize_text(hv), normalize_text(gv))
                   >= F.lit(float(fuzzy_fields[f])))
            )
        else:
            eq = hv.eqNullSafe(gv)
        matched = F.col("__has_h").isNotNull() & F.col("__has_g").isNotNull()
        tp = matched & eq
        fp = (matched & ~eq & hv.isNotNull()) | (
            F.col("__has_g").isNull() & hv.isNotNull()
        )
        fn = (matched & ~eq & gv.isNotNull()) | (
            F.col("__has_h").isNull() & gv.isNotNull()
        )
        aggs += [
            F.sum(tp.cast("long")).alias(f"__tp_{f}"),
            F.sum(fp.cast("long")).alias(f"__fp_{f}"),
            F.sum(fn.cast("long")).alias(f"__fn_{f}"),
        ]
    counts = j.agg(*aggs)

    per_field = F.array(*[
        F.struct(
            F.lit(f).alias("field"),
            F.col(f"__tp_{f}").alias("tp"),
            F.col(f"__fp_{f}").alias("fp"),
            F.col(f"__fn_{f}").alias("fn"),
        )
        for f in fields
    ])
    out = counts.select(F.explode(per_field).alias("e")).select("e.*")

    # guarded ratios (0/0 -> 0.0, mirroring safe_div in A2)
    prec = F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0)) \
            .otherwise(F.col("tp") / (F.col("tp") + F.col("fp")))
    rec = F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0)) \
           .otherwise(F.col("tp") / (F.col("tp") + F.col("fn")))
    f1 = F.when(prec + rec == 0, F.lit(0.0)) \
          .otherwise(2 * prec * rec / (prec + rec))
    return out.select(
        "field", "tp", "fp", "fn",
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
    )


def micro_macro_summary(metrics: DataFrame, round_to: int = 6) -> DataFrame:
    """Micro (sum counts first) and macro (average per-field ratios)
    aggregate rows — the two aggregation granularities of A2."""
    micro = metrics.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    prec = F.when(F.col("tp") + F.col("fp") == 0, F.lit(0.0)) \
            .otherwise(F.col("tp") / (F.col("tp") + F.col("fp")))
    rec = F.when(F.col("tp") + F.col("fn") == 0, F.lit(0.0)) \
           .otherwise(F.col("tp") / (F.col("tp") + F.col("fn")))
    f1 = F.when(prec + rec == 0, F.lit(0.0)) \
          .otherwise(2 * prec * rec / (prec + rec))
    micro_row = micro.select(
        F.lit("micro").alias("granularity"),
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
    )
    macro_row = metrics.agg(
        F.lit("macro").alias("granularity"),
        F.round(F.avg("precision"), round_to).alias("precision"),
        F.round(F.avg("recall"), round_to).alias("recall"),
        F.round(F.avg("f1"), round_to).alias("f1"),
    )
    return micro_row.unionByName(macro_row)
