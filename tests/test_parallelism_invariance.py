"""Parallelism-invariance: per-partition pass/fail + violation rows must
be identical regardless of input partitioning / shuffle width (the
sandbox evidence for the north rule's N-vs-4N-executors identity;
SURVEY.md §5.2 item 5).

Approx sketches (HLL approx_count_distinct, percentile_approx) are
merge-order dependent in their *observed metric values*, so the identity
contract covers (partition_id, constraint_id, passed, rows_checked,
violation_count) for observe-only stats rows and full row identity for
everything else. bench.py's scaling mode additionally fingerprints
results across separate local[8]/local[32] sessions.
"""

from pyspark.sql import functions as F

from chronominer_spark.constraints import SuiteEvaluator
from chronominer_spark.constraints.spec import default_transcript_suite
from chronominer_spark.datagen import ROLE_VOCAB, TOOL_VOCAB

STABLE_COLS = ["partition_id", "constraint_id", "snapshot_id", "passed",
               "rows_checked", "violation_count"]
APPROX_PREFIXES = ("stats:", "quantiles:")


def _evaluate(spark, df, ref, shuffle):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    try:
        from chronominer_spark.constraints.spec import default_vocab_dfs
        suite = default_transcript_suite(list(ROLE_VOCAB), list(TOOL_VOCAB))
        ev = SuiteEvaluator(spark, suite, default_vocab_dfs(spark, list(TOOL_VOCAB)))
        res, vio = ev.evaluate(df, ref, snapshot_id=3)
        return res.cache(), vio.cache()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_results_invariant_under_repartitioning(spark, transcripts, ref_snapshot):
    res_a, vio_a = _evaluate(spark, transcripts, ref_snapshot, shuffle=4)
    res_b, vio_b = _evaluate(
        spark, transcripts.repartition(64), ref_snapshot.repartition(16), shuffle=32
    )

    sa = res_a.select(STABLE_COLS)
    sb = res_b.select(STABLE_COLS)
    assert sa.exceptAll(sb).count() == 0
    assert sb.exceptAll(sa).count() == 0

    # exact (non-sketch) constraints must match on observed values too
    exact_a = res_a.where(~F.col("constraint_id").rlike("^(stats:|quantiles:)")) \
        .select(*STABLE_COLS, F.round("observed", 9).alias("obs"))
    exact_b = res_b.where(~F.col("constraint_id").rlike("^(stats:|quantiles:)")) \
        .select(*STABLE_COLS, F.round("observed", 9).alias("obs"))
    assert exact_a.exceptAll(exact_b).count() == 0
    assert exact_b.exceptAll(exact_a).count() == 0


def test_violations_invariant_under_repartitioning(spark, transcripts, ref_snapshot):
    _, vio_a = _evaluate(spark, transcripts, ref_snapshot, shuffle=4)
    _, vio_b = _evaluate(
        spark, transcripts.repartition(64), ref_snapshot.repartition(16), shuffle=32
    )
    assert vio_a.exceptAll(vio_b).count() == 0
    assert vio_b.exceptAll(vio_a).count() == 0


def test_round4_families_invariant_under_repartitioning(spark, transcripts,
                                                        ref_snapshot):
    """The round-4 constraint families obey the same N-vs-4N identity
    contract: monotone and expr_check must match on full rows including
    observed; drift_quantile (sketch-valued observed) on the stable
    columns."""
    from chronominer_spark.constraints.spec import (
        ConstraintSuite,
        drift_quantile,
        expr_check,
        monotone,
    )

    suite = ConstraintSuite(
        name="r4",
        constraints=(
            monotone("ts", ["conv_id"], ["turn_idx"]),
            expr_check("text_cap", "length(text) <= 100000"),
            drift_quantile("turn_idx", qs=[0.5, 0.99], max_abs_diff=5.0),
        ))

    def run(df, ref, shuffle):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
        try:
            res, vio = SuiteEvaluator(spark, suite).evaluate(
                df, ref, snapshot_id=4)
            return res.cache(), vio.cache()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    res_a, vio_a = run(transcripts, ref_snapshot, 4)
    res_b, vio_b = run(transcripts.repartition(64),
                       ref_snapshot.repartition(16), 32)

    exact_a = res_a.where(~F.col("constraint_id").startswith("qdrift:")) \
        .select(*STABLE_COLS, F.round("observed", 9).alias("obs"))
    exact_b = res_b.where(~F.col("constraint_id").startswith("qdrift:")) \
        .select(*STABLE_COLS, F.round("observed", 9).alias("obs"))
    assert exact_a.exceptAll(exact_b).count() == 0
    assert exact_b.exceptAll(exact_a).count() == 0

    qa = res_a.where(F.col("constraint_id").startswith("qdrift:")) \
        .select(STABLE_COLS)
    qb = res_b.where(F.col("constraint_id").startswith("qdrift:")) \
        .select(STABLE_COLS)
    assert qa.count() > 0
    assert qa.exceptAll(qb).count() == 0 and qb.exceptAll(qa).count() == 0

    assert vio_a.exceptAll(vio_b).count() == 0
    assert vio_b.exceptAll(vio_a).count() == 0


def test_conversation_shape_invariant_under_tied_order_keys(spark):
    """conversation_shape's lag/lead window orders by (order_by, role):
    with duplicate (conv, turn_idx) keys carrying DIFFERENT roles, the
    role tiebreaker makes the sequence a total order, so results and
    per-turn violation rows are identical under any partitioning /
    shuffle width — the same lag-tie hazard the monotone family fixed
    (without the tiebreaker, which neighbor `lag` sees is
    partition-order-dependent)."""
    from chronominer_spark.constraints.spec import (
        ConstraintSuite, conversation_shape)

    rows = []
    for c in range(40):
        cid = f"t{c:03d}"
        rows += [(cid, 1, "system", c % 4), (cid, 2, "user", c % 4),
                 (cid, 3, "assistant", c % 4)]
        # tied key: two turn-3 rows, roles differ -> role asc decides
        # adjacency ('assistant' < 'tool', so the sequence ends
        # ..., assistant, tool): the tool row breaks the closing edge
        # AND the last-role rule, but WHICH row is flagged (and that it
        # is flagged once) must not depend on partitioning
        if c % 5 == 0:
            rows.append((cid, 3, "tool", c % 4))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, pbucket int")
    suite = ConstraintSuite(
        name="shape_ties",
        constraints=(conversation_shape(
            role_col="role", over="conv_id", order_by=["turn_idx"],
            first_roles=["system"], last_roles=["user", "assistant"],
            allowed_transitions=[("system", "user"), ("user", "assistant"),
                                 ("assistant", "user")]),))

    def run(d, shuffle):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
        try:
            res, vio = SuiteEvaluator(spark, suite).evaluate(d, snapshot_id=5)
            return res.cache(), vio.cache()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    res_a, vio_a = run(df, 4)
    res_b, vio_b = run(df.repartition(64), 32)
    fa = res_a.select(*STABLE_COLS, F.round("observed", 9).alias("obs"))
    fb = res_b.select(*STABLE_COLS, F.round("observed", 9).alias("obs"))
    assert fa.exceptAll(fb).count() == 0 and fb.exceptAll(fa).count() == 0
    assert vio_a.count() > 0
    assert vio_a.exceptAll(vio_b).count() == 0
    assert vio_b.exceptAll(vio_a).count() == 0
