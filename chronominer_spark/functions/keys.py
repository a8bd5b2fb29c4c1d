"""Key construction and fingerprint functions.

- ``build_custom_id``: sanitize + sha256(8) suffix + 64-char cap, the
  stable unit-of-work key (``/root/reference/modules/extract/
  processing_strategy.py:63-92``).
- ``extract_chunk_index``: trailing ``-(chunk|page)-(\\d+)`` capture
  (``modules/extract/resume.py:59``, ``modules/batch/ops.py:109-120``).
- ``fingerprint``: sha256 content hashes used in the checkpoint chain
  (``modules/infra/jsonl.py:122-129``); :func:`dataset_fingerprint` is the
  order-insensitive whole-dataset variant (xor/sum of row hashes) usable
  at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_custom_id(stem: Column | str, index: Column | str, kind: str = "chunk") -> Column:
    stem_c = F.col(stem) if isinstance(stem, str) else stem
    idx_c = F.col(index) if isinstance(index, str) else index
    sanitized = F.regexp_replace(stem_c, r"[^A-Za-z0-9_-]", "_")
    suffix = F.concat(F.lit(f"-{kind}-"), idx_c.cast("string"))
    digest = F.substring(F.sha2(stem_c.cast("string"), 256), 1, 8)
    # cap the sanitized stem so stem + '-' + digest + suffix fits in 64
    max_stem = 64 - 1 - 8 - 12
    return F.concat(F.substring(sanitized, 1, max_stem), F.lit("-"), digest, suffix)


def extract_chunk_index(custom_id: Column | str) -> Column:
    c = F.col(custom_id) if isinstance(custom_id, str) else custom_id
    captured = F.regexp_extract(c, r"-(?:chunk|page)-(\d+)$", 1)
    return F.when(captured == "", F.lit(None)).otherwise(captured).cast("int")


def fingerprint(*cols: Column | str) -> Column:
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws("\x1f", *[c.cast("string") for c in cs]), 256)


def dataset_fingerprint(df: DataFrame) -> str:
    """Order-insensitive fingerprint of an entire DataFrame: sum of
    per-row xxhash64 over all columns (mod 2^64). Parallelism-invariant,
    single pass, no sort — usable on tables too large to order."""
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    # sum in decimal(38,0): a long sum of 64-bit hashes overflows under
    # ANSI mode (default in Spark 4)
    agg = df.select(
        F.sum(row_hash.cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    total = int(agg["s"] or 0) & 0xFFFFFFFFFFFFFFFF
    return f"{total:016x}-{agg['n']}"
