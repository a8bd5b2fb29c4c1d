"""Incremental (streaming) exact deduplication — the streaming twin of
:func:`chronominer_spark.operators.dedup.exact_dedup`.

A curation pipeline does not ingest its corpus in one batch: documents
arrive continuously, and "keep the first copy of each distinct content"
must hold ACROSS micro-batches — a new batch's duplicates of an
already-seen content key are losers, whatever order the batches came in.

Shape (mirrors how the reference keeps durable progress across waves —
``/root/reference/modules/infra/jsonl.py:27-57`` append log +
``main/check_batches.py:145-176`` idempotent finalization):

- ``foreachBatch`` + a compacted CONTENT-KEY STATE TABLE
  ``(__ck, __w, dup_count)`` — one row per distinct content key holding
  the current winner struct and the running duplicate count. State is
  O(distinct keys), never O(rows ingested).
- Each micro-batch is first collapsed map-side to the same per-key
  partial (``min(struct)`` + ``count``) that batch ``exact_dedup``
  uses, then merged with the state by one more ``min``/``sum``
  hash-aggregate. Both folds are associative+commutative, so the final
  state is IDENTICAL to running batch ``exact_dedup`` over the full
  concatenated input — asserted in tests for a 3-way split.
- The merged state commits through :class:`SnapshotTable`'s atomic
  pointer flip, with the batch id recorded in the snapshot log; a
  REPLAYED batch (foreachBatch's at-least-once contract after a crash)
  is detected by id and skipped — ST6 idempotent finalization.

Scale posture: the state snapshot is partitioned by a content-key hash
bucket, so the merge shuffles on ``__ck`` into co-located buckets and a
real table format (Iceberg) would express the same merge as
``MERGE INTO state USING batch_partial ON state.__ck = src.__ck``
rewriting only touched buckets — the compaction/commit discipline here
is the sandbox-faithful stand-in for that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from chronominer_spark.operators.dedup import content_key
from chronominer_spark.tables import SnapshotTable


class IncrementalExactDedup:
    """Maintains exact-dedup state across micro-batches.

    Parameters mirror :func:`exact_dedup`: the winner per content key is
    ``min(struct(id_col, *other_columns))`` and ``dup_count`` counts
    every row ever seen with that key.
    """

    def __init__(
        self, spark: SparkSession, state_root: str,
        id_col: str, text_col: str, normalize: bool = True,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.table = SnapshotTable(spark, state_root)
        self.id_col = id_col
        self.text_col = text_col
        self.normalize = normalize
        self.n_buckets = n_buckets

    # -- batch fold ---------------------------------------------------------
    def _partial(self, batch_df: DataFrame) -> DataFrame:
        """Collapse one micro-batch to (__ck, __w, dup_count, __bucket) —
        the identical map-side partial batch exact_dedup computes."""
        cols = batch_df.columns
        others = [c for c in cols if c != self.id_col]
        return (
            batch_df
            .withColumn("__ck", content_key(self.text_col, self.normalize))
            .groupBy("__ck")
            .agg(
                F.min(F.struct(F.col(self.id_col),
                               *[F.col(c) for c in others])).alias("__w"),
                F.count(F.lit(1)).alias("dup_count"),
            )
            .withColumn("__bucket",
                        F.pmod(F.xxhash64("__ck"), F.lit(self.n_buckets)))
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: merge the batch partial into the state and
        commit atomically. Replays of an already-committed batch id are
        skipped (idempotent under foreachBatch's at-least-once
        delivery)."""
        op = f"dedup_batch={batch_id}"
        if any(s.operation == op for s in self.table.snapshots()):
            return
        partial = self._partial(batch_df)
        if self.table.exists():
            merged = (
                self.table.read().unionByName(partial)
                .groupBy("__ck")
                .agg(F.min("__w").alias("__w"),
                     F.sum("dup_count").alias("dup_count"),
                     F.first("__bucket").alias("__bucket"))
            )
        else:
            merged = partial
        self.table.write_snapshot(merged, partition_by=["__bucket"],
                                  operation=op)

    # -- streaming driver ---------------------------------------------------
    def attach(self, stream_df: DataFrame,
               checkpoint_dir: str) -> StreamingQuery:
        """Attach to a streaming DataFrame: every micro-batch folds into
        the state table through :meth:`process_batch`."""
        return (
            stream_df.writeStream
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    # -- read back ----------------------------------------------------------
    def result(self) -> DataFrame:
        """Current survivors in batch ``exact_dedup``'s output shape:
        the original columns of the winner row + ``dup_count``."""
        state = self.table.read()
        winner_cols = state.select("__w.*").columns
        return state.select(
            *[F.col(f"__w.{c}").alias(c) for c in winner_cols], "dup_count"
        )
