"""Multimodal plumbing and streaming validation tests."""

import time

from pyspark.sql import functions as F

from chronominer_spark.operators.multimodal import (
    extract_features,
    strip_payloads,
    synthesize_media,
)


def test_multimodal_feature_extraction(spark):
    media = synthesize_media(spark, n=48)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 48
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["byte_size"] > 0 for r in rows)
    # deterministic: same input -> same features
    again = {r["media_id"]: r["payload_sha"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["payload_sha"] for r in rows)


def test_strip_payloads_projects_blob_away(spark):
    media = synthesize_media(spark, n=8)
    lean = strip_payloads(media)
    assert "payload" not in lean.columns
    assert lean.where(F.col("byte_size") <= 0).count() == 0


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    from chronominer_spark.streaming.validate import windowed_event_counts_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "stream_src")
    events.write.mode("overwrite").parquet(src)

    q = windowed_event_counts_stream(
        spark, src, events.schema, watermark="1 hour",
        window="1 hour", query_name="wc_test", output_mode="complete",
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM wc_test")

    batch = (
        events.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("h").cast("timestamp").cast("long").alias("win_start"),
                "event_type", "n", "total")
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_incremental_validation_sink(spark, tmp_path, transcripts):
    from chronominer_spark.streaming.validate import incremental_validation_query

    src = str(tmp_path / "tsrc")
    # two "arrival" files -> two micro-batches (maxFilesPerTrigger=1)
    transcripts.where(F.col("pbucket") < 4).coalesce(1).write.mode("overwrite") \
        .parquet(src + "/a")
    transcripts.where(F.col("pbucket") >= 4).coalesce(1).write.mode("append") \
        .parquet(src + "/b")
    # streaming source needs a flat dir of files
    import glob
    import shutil
    flat = str(tmp_path / "flat")
    import os
    os.makedirs(flat, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(src + "/*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/file{i}.parquet")

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_validation_query(
        spark, flat, transcripts.schema, sink, ckpt
    )
    q.processAllAvailable()
    q.stop()

    out = spark.read.option("basePath", sink).parquet(sink + "/batch_id=*")
    total_rows = out.agg(F.sum("rows_checked")).collect()[0][0]
    assert total_rows == transcripts.count()
    n_null_roles = out.agg(F.sum("`not_null:role`")).collect()[0][0]
    oracle = transcripts.where(F.col("role").isNull()).count()
    assert n_null_roles == oracle
