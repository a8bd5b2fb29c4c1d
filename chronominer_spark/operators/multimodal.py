"""Multimodal column plumbing: image/audio/video as opaque binary.

The decode/feature-extract steps need codec libraries that are not in
this container, so the *decoders* are stubbed (clearly marked) behind a
deterministic fake — but the Spark-side plumbing is real and tested:
typed schema (binary payload + metadata struct), Arrow-batched
``mapInPandas`` with bounded batch size, partition-count preservation,
and feature columns with declared schemas.

Pattern parity: the reference strips base64 image payloads down to
``{type: image_omitted, byte_size}`` before persisting
(``/root/reference/modules/conversion/json_utils.py:40-117``) and
renders pages one-at-a-time in bounded queues for constant memory
(``modules/extract/processing_strategy.py:880-981``) — here the payload
stays out of the shuffled columns (project-to-metadata first) and Arrow
batches bound memory per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image | audio | video
    T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = (
    "media_id long, kind string, byte_size long, payload_sha string, "
    "feature array<float>"
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes
    derived from sha2 of the id (stands in for real encoded frames)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            kinds.alias("kind"),
            F.repeat(F.sha2(F.concat(F.lit(seed), F.col("id")), 256), 8)
            .cast("binary").alias("payload"),
            F.struct(
                F.lit("application/x-fake").alias("mime"),
                F.lit(64).cast("int").alias("width"),
                F.lit(64).cast("int").alias("height"),
                (F.pmod(F.col("id") * 37, F.lit(10_000))).cast("int")
                .alias("duration_ms"),
            ).alias("meta"),
        )
    )


def _decode_payload(payload: bytes, kind: str) -> list[float]:
    """STUB: real implementation would decode with PIL/ffmpeg/torchaudio
    (not installed in this container) and extract model features. The
    deterministic fake hashes bytes into a fixed-length feature so the
    pipeline shape (schema, batching, downstream joins) is fully
    exercised. Raise instead if strict mode is ever needed:
    ``raise NotImplementedError("codec libs unavailable in sandbox")``.
    """
    import hashlib
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(
    media: DataFrame, batch_rows: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams bounded Arrow batches per partition (constant
    memory regardless of payload sizes); the payload column is projected
    away immediately after hashing so only small feature rows shuffle.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                payloads = chunk["payload"]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"],
                    "kind": chunk["kind"],
                    "byte_size": payloads.map(lambda b: len(b) if b is not None else 0),
                    "payload_sha": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": [
                        _decode_payload(b, k)
                        for b, k in zip(payloads, chunk["kind"])
                    ],
                })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def strip_payloads(media: DataFrame) -> DataFrame:
    """P4 payload stripping: replace blobs with size metadata before any
    wide shuffle (the reference's image-omitted projection)."""
    return media.select(
        "media_id", "kind", "meta",
        F.length("payload").alias("byte_size"),
        F.lit("payload_omitted").alias("payload_status"),
    )
