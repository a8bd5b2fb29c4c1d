"""Cross-run reporting over the engine's result tables.

The reference surfaces "what changed since the last run" by diffing its
batch logs and retry ledgers (ChronoMiner
``modules/extract/resume.py`` failed-chunk ledger;
``modules/extract/batch_output.py:180`` failed-chunk sets;
``modules/infra/jsonl.py`` replay headers); for a validation engine the operational twin is a REGRESSION
DIFF between two snapshots' per-partition result rows: which
(partition, constraint) verdicts newly fail, which resolved, which
persist, and how the violation counts moved.

Scale posture: result tables are O(partitions x constraints) — many
orders below the data being validated — so the full-outer diff is a
broadcastable join; no row-level data is touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_validation_results(prev: DataFrame, cur: DataFrame) -> DataFrame:
    """Full-outer diff of two runs' result tables on
    (partition_id, constraint_id).

    ``transition`` per pair:

    - ``regressed``  — passed before, fails now (the page-alert row)
    - ``resolved``   — failed before, passes now
    - ``persisting`` — failed in both runs
    - ``stable``     — passed in both runs
    - ``new``        — (partition, constraint) only in the current run
    - ``retired``    — only in the previous run

    ``violations_delta`` is current minus previous counts (absent side
    counted 0), so a persisting constraint that got WORSE is visible
    without reading violation rows.
    """
    p = prev.select(
        "partition_id", "constraint_id",
        F.col("passed").alias("__passed_prev"),
        F.col("violation_count").alias("violations_prev"))
    c = cur.select(
        "partition_id", "constraint_id",
        F.col("passed").alias("__passed_cur"),
        F.col("violation_count").alias("violations_cur"))
    j = p.join(c, ["partition_id", "constraint_id"], "full_outer")
    transition = (
        F.when(F.col("__passed_prev").isNull(), F.lit("new"))
        .when(F.col("__passed_cur").isNull(), F.lit("retired"))
        .when(F.col("__passed_prev") & ~F.col("__passed_cur"),
              F.lit("regressed"))
        .when(~F.col("__passed_prev") & F.col("__passed_cur"),
              F.lit("resolved"))
        .when(~F.col("__passed_prev") & ~F.col("__passed_cur"),
              F.lit("persisting"))
        .otherwise(F.lit("stable"))
    )
    return j.select(
        "partition_id", "constraint_id",
        transition.alias("transition"),
        F.coalesce("violations_prev", F.lit(0)).cast("long")
        .alias("violations_prev"),
        F.coalesce("violations_cur", F.lit(0)).cast("long")
        .alias("violations_cur"),
        (F.coalesce("violations_cur", F.lit(0))
         - F.coalesce("violations_prev", F.lit(0))).cast("long")
        .alias("violations_delta"),
    )


def flag_partition_outliers(
    metrics: DataFrame,
    metric: str = "observed",
    by: list[str] | None = None,
    partition_col: str = "partition_id",
    k: float = 3.0,
) -> DataFrame:
    """Robust cross-partition anomaly screen: within each ``by`` group
    (default: per constraint), flag partitions whose ``metric``
    deviates from the fleet MEDIAN by more than ``k`` x MAD (median
    absolute deviation). Median/MAD instead of mean/stddev because the
    outliers being hunted would poison the baseline they are judged
    against — one sick partition inflates a stddev enough to hide
    itself, but moves the median of a fleet not at all.

    The reference's nearest analog is its end-of-run per-file outcome
    tally (``main/process_text_files.py:684-790`` complete / partial /
    failed counts); this screen EXTENDS that idea to soft anomalies —
    a partition can pass every hard threshold yet sit far outside the
    fleet's metric distribution, and that is worth a look before it
    becomes a failure. The input here is the engine's RESULTS table — O(partitions x constraints)
    rows, orders below the validated data — so two exact ``percentile``
    aggregations over the tiny frame cost nothing and no row-level data
    is touched. MAD = 0 (a perfectly uniform fleet) flags ANY deviation,
    the strictest consistent reading.

    Output: ``by`` + partition + metric value, ``fleet_median``,
    ``fleet_mad``, ``abs_dev``, ``is_outlier``.
    """
    by = list(by) if by is not None else ["constraint_id"]
    med = metrics.groupBy(*by).agg(
        F.expr(f"percentile({metric}, 0.5)").alias("fleet_median"))
    j = metrics.join(med, by)
    mad = j.groupBy(*by).agg(
        F.expr(f"percentile(abs({metric} - fleet_median), 0.5)")
        .alias("fleet_mad"))
    return (
        j.join(mad, by)
        .select(
            *by, partition_col, F.col(metric),
            "fleet_median", "fleet_mad",
            F.abs(F.col(metric) - F.col("fleet_median")).alias("abs_dev"),
            (F.abs(F.col(metric) - F.col("fleet_median"))
             > F.lit(k) * F.col("fleet_mad")).alias("is_outlier"),
        )
    )
