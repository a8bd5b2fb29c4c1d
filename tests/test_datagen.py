"""Generator invariants: determinism, skew, planted violations."""

from pyspark.sql import functions as F

from chronominer_spark.datagen import (
    ROLE_VOCAB,
    TOOL_VOCAB,
    generate_transcripts,
)


def test_deterministic_at_any_parallelism(spark, gen_cfg, transcripts):
    again = generate_transcripts(spark, gen_cfg).repartition(3)
    assert transcripts.exceptAll(again).count() == 0
    assert again.exceptAll(transcripts).count() == 0


def test_schema(transcripts):
    assert [f.name for f in transcripts.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "pbucket",
    ]


def test_conversation_skew(transcripts):
    sizes = (
        transcripts.groupBy("conv_id").count()
        .agg(F.max("count").alias("mx"), F.expr("percentile(count, 0.5)").alias("med"))
        .collect()[0]
    )
    # Zipf-ish: hottest conversation much larger than the median
    assert sizes["mx"] > 10 * sizes["med"]


def test_planted_violations_exist(transcripts):
    n_dupes = (
        transcripts.groupBy("conv_id", "turn_idx").count()
        .where(F.col("count") > 1).count()
    )
    assert n_dupes > 0
    assert transcripts.where(F.col("role").isNull()).count() > 0
    assert transcripts.where(~F.col("role").isin(ROLE_VOCAB) & F.col("role").isNotNull()).count() > 0
    assert transcripts.where(F.col("text") == "").count() > 0
    assert (
        transcripts.where(~F.col("tool").isin(TOOL_VOCAB) & F.col("tool").isNotNull()).count() > 0
    )


def test_turn_idx_contiguous_for_clean_conversations(spark, transcripts):
    # ignoring planted duplicate rows, turn_idx per conversation is 1..n
    per_conv = (
        transcripts.dropDuplicates(["conv_id", "turn_idx"])
        .groupBy("conv_id")
        .agg(F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"),
             F.count(F.lit(1)).alias("n"))
    )
    bad = per_conv.where((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
    assert bad.count() == 0


def test_reference_snapshot_differs_controlled(transcripts, ref_snapshot):
    cur_n = transcripts.count()
    ref_n = ref_snapshot.count()
    # drops and adds are both small fractions
    assert abs(ref_n - cur_n) < cur_n * 0.01
    mutated = ref_snapshot.where(F.col("text").endswith("MUTATED")).count()
    assert mutated > 0
