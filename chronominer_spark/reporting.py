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


def render_markdown_report(
    results: DataFrame,
    violations: DataFrame | None = None,
    title: str = "Validation report",
    max_failed_rows: int = 50,
    max_sample_violations: int = 20,
) -> str:
    """Human-readable Markdown report over one run's result tables —
    the analog of the reference's Markdown metrics rendering
    (``/root/reference/eval/metrics.py:677-746`` format_metrics_table),
    re-targeted at constraint verdicts.

    Sections: run header (rows checked, verdict totals), a
    per-constraint summary table (partitions, failed partitions, rows
    checked, violations, worst partition by violation count), the
    failed (partition, constraint) verdicts, and a sample of violation
    rows with lineage.

    Scale posture: everything rendered derives from the results table
    (O(partitions × constraints)) plus a bounded ``limit()`` sample of
    violations — the collects are driver-side by design and bounded,
    never O(rows validated)."""
    res = results.select(
        "partition_id", "constraint_id", "passed",
        "rows_checked", "violation_count").cache()
    try:
        total = res.count()
        failed = res.where(~F.col("passed")).count()
        rows_checked = (res.groupBy("constraint_id")
                        .agg(F.sum("rows_checked").alias("n"))
                        .agg(F.max("n")).collect()[0][0]) or 0

        lines = [f"# {title}", ""]
        lines += [
            f"- result rows (partition × constraint): **{total}**",
            f"- failed verdicts: **{failed}**"
            + (" ✅" if failed == 0 else " ❌"),
            f"- rows checked (max per constraint): **{rows_checked:,}**",
            "",
            "## Per-constraint summary", "",
            "| constraint | partitions | failed | rows checked "
            "| violations | worst partition |",
            "|---|---|---|---|---|---|",
        ]
        per_c = (
            res.groupBy("constraint_id")
            .agg(F.count(F.lit(1)).alias("parts"),
                 F.sum((~F.col("passed")).cast("long")).alias("failed"),
                 F.sum("rows_checked").alias("rows"),
                 F.sum("violation_count").alias("vios"),
                 F.max(F.struct("violation_count", "partition_id"))
                 .alias("worst"))
            .orderBy("constraint_id").collect()
        )
        for r in per_c:
            worst = (r["worst"]["partition_id"]
                     if r["worst"] and (r["worst"]["violation_count"] or 0) > 0
                     else "—")
            lines.append(
                f"| `{r['constraint_id']}` | {r['parts']} | {r['failed']} "
                f"| {r['rows'] or 0:,} | {r['vios'] or 0:,} | {worst} |")

        bad = (res.where(~F.col("passed"))
               .orderBy("constraint_id", "partition_id")
               .limit(max_failed_rows).collect())
        lines += ["", "## Failed verdicts", ""]
        if not bad:
            lines.append("none 🎉")
        else:
            lines += ["| partition | constraint | violations |", "|---|---|---|"]
            lines += [f"| {r['partition_id']} | `{r['constraint_id']}` "
                      f"| {r['violation_count'] or 0:,} |" for r in bad]
            if len(bad) == max_failed_rows:
                lines.append(f"| … | truncated at {max_failed_rows} rows | |")

        if violations is not None:
            sample = (violations
                      .orderBy("partition_id", "constraint_id",
                               "conv_id", "turn_idx")
                      .limit(max_sample_violations).collect())
            lines += ["", "## Violation sample "
                          f"(first {max_sample_violations} by lineage)", ""]
            if not sample:
                lines.append("none")
            else:
                lines += ["| partition | constraint | conv | turn "
                          "| column | value | detail |",
                          "|---|---|---|---|---|---|---|"]
                for r in sample:
                    val = (str(r["value"])[:40].replace("|", "\\|")
                           if r["value"] is not None else "∅")
                    lines.append(
                        f"| {r['partition_id']} | `{r['constraint_id']}` "
                        f"| {r['conv_id']} | {r['turn_idx']} | {r['column']} "
                        f"| {val} | {r['detail'] or ''} |")
        return "\n".join(lines) + "\n"
    finally:
        res.unpersist()
