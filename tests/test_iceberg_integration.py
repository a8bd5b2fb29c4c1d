"""Jar-gated Iceberg integration: executable evidence for the engine's
Iceberg-readiness claim (BASELINE.json north star stores transcripts /
results / manifest in Iceberg tables; the sandbox ships no runtime jar,
so ``tables.SnapshotTable`` provides the same commit semantics over
parquet).

Every test here SKIPS unless :func:`chronominer_spark.tables.use_iceberg`
finds ``org.apache.iceberg.catalog.Catalog`` on the session classpath —
the day a jar exists (``--packages org.apache.iceberg:
iceberg-spark-runtime-4.0_2.13:<ver>`` or a cluster-provided one), the
interface claims become green checks with zero code changes:

- snapshot-per-commit + time travel (what SnapshotTable emulates with
  ``v{N}/`` dirs and the ``_latest`` pointer),
- idempotent per-partition overwrite (what the runner's dynamic
  partition overwrite provides on parquet) — the re-run-never-duplicates
  contract the checkpoint manifest depends on.

The Hadoop catalog is registered at RUNTIME via ``spark.conf.set`` —
Iceberg catalogs resolve lazily, so the shared test session works; no
SQL-extensions-only features (MERGE) are used.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def catalog(spark, tmp_path):
    from chronominer_spark.tables import use_iceberg

    if not use_iceberg(spark):
        pytest.skip("no Iceberg runtime jar on the session classpath")
    name = "cm_it"
    spark.conf.set(f"spark.sql.catalog.{name}",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{name}.warehouse",
                   str(tmp_path / "warehouse"))
    return name


def test_snapshot_commits_and_time_travel(spark, catalog):
    """Append-commits create one snapshot each; VERSION AS OF replays
    the first — the contract SnapshotTable.commit/read(snapshot_id=...)
    emulates on parquet."""
    tbl = f"{catalog}.db.transcripts_it"
    v1 = spark.createDataFrame(
        [("c1", 0, "hello"), ("c1", 1, "world")],
        "conv_id string, turn_idx int, text string",
    )
    v1.writeTo(tbl).create()
    spark.createDataFrame(
        [("c2", 0, "more")], "conv_id string, turn_idx int, text string"
    ).writeTo(tbl).append()

    snaps = spark.sql(f"SELECT snapshot_id FROM {tbl}.snapshots "
                      "ORDER BY committed_at").collect()
    assert len(snaps) == 2
    first = snaps[0]["snapshot_id"]
    old = spark.read.option("snapshot-id", first).table(tbl)
    assert old.count() == 2
    assert spark.table(tbl).count() == 3


def test_idempotent_partition_overwrite(spark, catalog):
    """overwritePartitions replaces only the partitions present in the
    frame — re-validating one partition never duplicates rows and never
    touches sibling partitions (the runner's dynamic-overwrite contract,
    runner._write)."""
    tbl = f"{catalog}.db.results_it"
    res = spark.createDataFrame(
        [("p=0", "not_null:text", True), ("p=1", "not_null:text", True)],
        "partition_id string, constraint_id string, passed boolean",
    )
    res.writeTo(tbl).partitionedBy(F.col("partition_id")).create()

    rewrite = spark.createDataFrame(
        [("p=1", "not_null:text", False)],
        "partition_id string, constraint_id string, passed boolean",
    )
    rewrite.writeTo(tbl).overwritePartitions()
    rewrite.writeTo(tbl).overwritePartitions()  # re-run: idempotent

    rows = {(r["partition_id"], r["passed"])
            for r in spark.table(tbl).collect()}
    assert rows == {("p=0", True), ("p=1", False)}


def test_runner_shaped_results_roundtrip(spark, catalog, tmp_path):
    """Write a real evaluator results frame into an Iceberg table with
    the runner's stamping, then read it back grouped — the minimal
    end-to-end path a cluster deployment would take."""
    from chronominer_spark.constraints import SuiteEvaluator
    from chronominer_spark.constraints.spec import (
        ConstraintSuite,
        not_null,
        unique,
    )

    df = spark.createDataFrame(
        [("c1", 0, "a", "x", 0), ("c1", 1, "a", None, 0),
         ("c2", 0, "b", "y", 1), ("c2", 0, "b", "y", 1)],
        "conv_id string, turn_idx int, role string, text string, pbucket int",
    ).withColumn("ts", F.current_timestamp()).withColumn("tool", F.lit(None).cast("string"))
    suite = ConstraintSuite(
        name="it", constraints=(not_null("text"), unique("conv_id", "turn_idx")),
    )
    ev = SuiteEvaluator(spark, suite)
    res, vio = ev.evaluate(df, None, snapshot_id=3)
    tbl = f"{catalog}.db.suite_results_it"
    res.withColumn("run_id", F.lit("it-run")) \
        .writeTo(tbl).partitionedBy(F.col("partition_id")).create()
    got = spark.table(tbl)
    assert got.where(F.col("constraint_id") == "not_null:text")
    viols = got.agg(F.sum("violation_count")).collect()[0][0]
    assert viols == 2  # one null text + one duplicate key
    ev.unpersist_all()
