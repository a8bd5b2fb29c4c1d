"""Sources: file discovery, permissive JSONL, text-document ingest.

Reference parity (SURVEY.md §2.1):

- S2 file discovery with sidecar exclusion (``/root/reference/main/
  process_text_files.py:997-1017``): glob + exclusion patterns so the
  tool's own outputs are never re-ingested.
- S3 permissive JSONL (``modules/infra/jsonl.py:60-83``): skip blanks,
  quarantine malformed lines into a corrupt-record column instead of
  failing the scan, tolerate BOM.
- S1 text scan (``modules/extract/file_processor.py:399-428``): read
  whole documents, preserve interior whitespace, strip only line
  terminators; carry ``input_file_name`` as the document key and a
  1-based absolute line index (W6: indices computed once, filters never
  renumber).
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_EXCLUDES = ["*_output.txt", "*_line_ranges.txt", "*_context.txt"]


def discover_files(
    root: str,
    patterns: list[str] = ("*.txt", "*.md"),
    excludes: list[str] | None = None,
) -> list[str]:
    """Recursive discovery with sidecar exclusion. Driver-side listing
    (cheap metadata); on object stores this becomes the catalog/manifest
    listing."""
    excludes = DEFAULT_EXCLUDES if excludes is None else excludes
    found: list[str] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in sorted(filenames):
            if not any(fnmatch.fnmatch(fn, p) for p in patterns):
                continue
            if any(fnmatch.fnmatch(fn, e) for e in excludes):
                continue
            found.append(os.path.join(dirpath, fn))
    return sorted(found)


def read_text_documents(
    spark: SparkSession, paths: list[str] | str
) -> DataFrame:
    """Line-oriented document scan: (doc_path, line_no, line). Line
    terminators are stripped by the source; interior whitespace is
    preserved. ``line_no`` is the 1-based absolute index within the
    document (stable under any later slicing).

    Ordering is physical-order-correct for files larger than one split:
    ``monotonically_increasing_id`` alone is only monotone WITHIN a
    split and says nothing about split order, so big files could get
    scrambled line numbers. Ordering by ``(_metadata.file_block_start,
    monotonically_increasing_id)`` fixes that — the block byte offset
    orders the splits of a file, the id orders rows inside each split
    (the text source reads a split sequentially)."""
    from pyspark.sql import Window as W

    df = spark.read.text(paths)
    w = W.partitionBy(F.col("_metadata.file_path")).orderBy(
        F.col("_metadata.file_block_start").asc(),
        F.monotonically_increasing_id().asc(),
    )
    return df.select(
        F.col("_metadata.file_path").alias("doc_path"),
        F.row_number().over(w).alias("line_no"),
        F.col("value").alias("line"),
    )


def read_jsonl_permissive(
    spark: SparkSession,
    paths: list[str] | str,
    schema=None,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Permissive JSONL read: returns (good, quarantined). Malformed
    lines land in ``corrupt_col`` (PERMISSIVE mode) instead of failing
    the job; blank lines are dropped; BOM tolerated by the JSON parser.
    """
    reader = spark.read.option("mode", "PERMISSIVE") \
        .option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        from pyspark.sql import types as T
        if corrupt_col not in [f.name for f in schema.fields]:
            schema = T.StructType(
                list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
            )
        reader = reader.schema(schema)
    # cache: Spark disallows queries that reference only the internal
    # corrupt-record column of a raw JSON scan (SPARK-21610)
    df = reader.json(paths).cache()
    if corrupt_col not in df.columns:
        # fully-clean input: schema inference dropped the corrupt column
        good = df
        bad = df.limit(0).withColumn(corrupt_col, F.lit(None).cast("string"))
        return good, bad.select(corrupt_col)
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad
