"""Metered-resource accounting: multi-key bucket ledgers and EWMA.

Re-expresses the reference's token-accounting engine (SURVEY.md §0.6):

- per-(provider, key-env, pool) daily buckets with a combined total
  (``/root/reference/modules/infra/token_tracker.py:972-1092``,
  ``modules/infra/shared_ledger.py:317-372``) -> one-pass ``rollup``
  aggregation (:func:`ledger_rollup`) — the two-tier totals the
  reference computes with two hand-written passes;
- EWMA per-call usage estimate, α=0.3
  (``modules/infra/token_tracker.py:263-265,1001``) ->
  :func:`ewma_per_key`, an Arrow-vectorized grouped map using pandas'
  native ``ewm`` (recursive state that plain SQL cannot express without
  quadratic window math);
- day rollover at an offset UTC boundary
  (``modules/infra/token_tracker.py:146-152,943``) ->
  :func:`accounting_day`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def accounting_day(ts_col, rollover_minutes: int = 1) -> F.Column:
    """UTC accounting day with rollover at 00:0{rollover} UTC (usage at
    00:00:30 still bills to the previous day, mirroring the reference's
    00:01 UTC boundary)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    shifted = c.cast("timestamp") - F.make_interval(mins=F.lit(rollover_minutes))
    return F.to_date(shifted)


def ledger_rollup(
    usage: DataFrame,
    keys: list[str],
    amount_col: str,
    round_to: int = 2,
) -> DataFrame:
    """Per-bucket sums plus every combined-total tier in ONE pass
    (rollup = partial aggregation reused across tiers; the reference
    recomputes the combined scope separately under a file lock)."""
    return (
        usage.rollup(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.round(F.sum(amount_col), round_to).alias("total"),
        )
        .select(
            *[F.coalesce(F.col(k).cast("string"), F.lit("ALL")).alias(k) for k in keys],
            "n_calls", "total",
        )
    )


def ewma_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key exponentially weighted moving average over event order.

    Recursive carry state -> grouped-map pandas UDF (Arrow batches, one
    group per key; pandas' ``ewm`` is vectorized C). Output adds
    ``ewma`` per row. Keys are assumed to have cluster-manageable group
    sizes (the reference's per-(provider,key,pool) streams are small);
    a hot key would be chunked upstream.
    """
    out_fields = df.schema.fields
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields]
        + ["ewma double"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(*key_cols).applyInPandas(fn, schema=schema)


def budget_check(
    ledger: DataFrame,
    keys: list[str],
    total_col: str,
    budgets: DataFrame,
) -> DataFrame:
    """Join bucket totals to per-bucket budgets (broadcast dim) and flag
    exhaustion — the admission-control predicate (ST2) as a plan."""
    joined = ledger.join(F.broadcast(budgets), on=keys, how="left")
    return joined.withColumn(
        "exhausted",
        F.col(total_col) >= F.coalesce(F.col("budget"), F.lit(float("inf"))),
    ).withColumn(
        "headroom",
        F.greatest(
            F.coalesce(F.col("budget"), F.lit(float("inf"))) - F.col(total_col),
            F.lit(0.0),
        ),
    )
