"""Driver loop: plan partitions -> skip completed -> evaluate -> commit.

The Spark re-expression of the reference's per-file lifecycle
(``/root/reference/modules/extract/file_processor.py:769-1161``):

1. resolve the table snapshot (analog: detect prior status),
2. anti-filter completed partitions via the checkpoint manifest
   (analog: skip-set before expensive work — skip happens *before* the
   scan, so completed partitions are pruned at the source),
3. evaluate the suite on the pending partitions only,
4. write results/violations with **dynamic partition overwrite** keyed by
   partition_id — idempotent per-partition commits, so a re-run never
   duplicates rows (the by-construction version of last-wins dedup,
   ``modules/extract/batch_output.py:108-128``),
5. commit the manifest per wave (durable progress, analog of the
   flush-per-record temp JSONL).

Waves: partitions are validated in groups of ``wave_size``; a crash
between waves loses at most one wave of work and the next run resumes
from the manifest (tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

import logging
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronominer_spark.checkpoint import CheckpointManifest
from chronominer_spark.constraints.engine import SuiteEvaluator
from chronominer_spark.constraints.spec import ConstraintSuite

log = logging.getLogger(__name__)


@dataclass
class RunSummary:
    """Outcome accounting, mirroring the reference's exit-code contract
    statuses {complete, partial, failed, skipped}
    (``main/process_text_files.py:1239-1295``)."""

    run_id: str
    snapshot_id: int
    suite_hash: str
    completed: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    failed: list[str] = field(default_factory=list)
    wall_seconds: float = 0.0
    rows_validated: int = 0

    @property
    def status(self) -> str:
        if self.failed:
            return "partial" if self.completed else "failed"
        return "complete"

    @property
    def exit_code(self) -> int:
        return {"complete": 0, "partial": 1, "failed": 2}[self.status]


class SuiteRunner:
    def __init__(
        self,
        spark: SparkSession,
        suite: ConstraintSuite,
        output_root: str,
        vocab_dfs: dict[str, DataFrame] | None = None,
    ):
        self.spark = spark
        self.suite = suite
        self.output_root = output_root
        self.evaluator = SuiteEvaluator(spark, suite, vocab_dfs)
        self.manifest = CheckpointManifest(os.path.join(output_root, "manifest.json"))

    @property
    def results_path(self) -> str:
        return os.path.join(self.output_root, "results")

    @property
    def violations_path(self) -> str:
        return os.path.join(self.output_root, "violations")

    # ------------------------------------------------------------------
    def _partition_values(self, df: DataFrame) -> list:
        col = self.suite.partition_col
        return sorted(
            r[col] for r in df.select(col).distinct().collect()
        )

    def _partition_id(self, value) -> str:
        return self.suite.partition_fmt % value

    def _stamp(self, df: DataFrame, run_id: str) -> DataFrame:
        return df.withColumn("run_id", F.lit(run_id)).withColumn(
            "evaluated_at", F.current_timestamp()
        )

    def _write(self, df: DataFrame, path: str) -> None:
        # partitionOverwriteMode=dynamic (session conf): only the
        # partition_id directories present in `df` are replaced -> reruns
        # are idempotent per partition.
        (
            df.write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(path)
        )

    # ------------------------------------------------------------------
    def run(
        self,
        df: DataFrame,
        ref_df: DataFrame | None = None,
        snapshot_id: int = 0,
        run_id: str | None = None,
        wave_size: int | None = None,
        with_violations: bool = True,
    ) -> RunSummary:
        t0 = time.time()
        run_id = run_id or uuid.uuid4().hex[:12]
        suite_hash = self.suite.suite_hash()
        summary = RunSummary(run_id=run_id, snapshot_id=snapshot_id,
                             suite_hash=suite_hash)

        if self.manifest.has_drift(suite_hash):
            log.warning(
                "checkpoint manifest contains entries for a different "
                "suite_hash — config drift detected; completed work under "
                "the old config is NOT reused (refuse-on-drift semantics)"
            )

        all_parts = self._partition_values(df)
        done = self.manifest.completed_partitions(snapshot_id, suite_hash)
        pending = [p for p in all_parts if self._partition_id(p) not in done]
        summary.skipped = [self._partition_id(p) for p in all_parts
                           if self._partition_id(p) in done]

        if not pending:
            summary.wall_seconds = time.time() - t0
            return summary

        waves: list[list]
        if wave_size is None or wave_size >= len(pending):
            waves = [pending]
        else:
            waves = [pending[i:i + wave_size]
                     for i in range(0, len(pending), wave_size)]

        pcol = self.suite.partition_col
        for wave in waves:
            sub = df.where(F.col(pcol).isin(wave))
            sub_ref = ref_df.where(F.col(pcol).isin(wave)) if ref_df is not None else None
            res, vio = self.evaluator.evaluate(
                sub, sub_ref, snapshot_id=snapshot_id,
                with_violations=with_violations,
            )
            self._write(self._stamp(res, run_id), self.results_path)
            if with_violations:
                self._write(self._stamp(vio, run_id), self.violations_path)
            self.evaluator.unpersist_all()
            pids = [self._partition_id(p) for p in wave]
            self.manifest.mark_completed(pids, snapshot_id, suite_hash, run_id)
            summary.completed.extend(pids)

        summary.rows_validated = (
            self.results(run_only=run_id)
            .where(F.col("constraint_id").startswith("not_null:"))
            .groupBy("constraint_id").agg(F.sum("rows_checked").alias("n"))
            .agg(F.max("n")).collect()[0][0] or 0
        )
        summary.wall_seconds = time.time() - t0
        return summary

    # ------------------------------------------------------------------
    def results(self, run_only: str | None = None) -> DataFrame:
        df = self.spark.read.parquet(self.results_path)
        return df.where(F.col("run_id") == run_only) if run_only else df

    def violations(self) -> DataFrame:
        return self.spark.read.parquet(self.violations_path)
