"""Regenerate tests/fixtures/suite_stable_500k.json — the golden
stable-column result rows of the default suite over the deterministic
500k-turn bench input.

Motivation (BENCH/BASELINE.md "results-fingerprint provenance"): a
sum-of-hashes fingerprint detects drift but cannot say WHICH row
changed. Vendoring the full stable rows (480 of them — tiny) turns any
future fingerprint change into an actionable row-wise diff.

Usage: python tools/gen_suite_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STABLE_COLS = ["partition_id", "constraint_id", "snapshot_id", "passed",
               "rows_checked", "violation_count"]
N_TURNS = 500_000
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "suite_stable_500k.json")


def compute_rows(spark):
    from bench import _materialize_transcripts
    from chronominer_spark.constraints import SuiteEvaluator
    from chronominer_spark.constraints.spec import (
        default_transcript_suite, default_vocab_dfs)
    from chronominer_spark.datagen import ROLE_VOCAB, TOOL_VOCAB

    cur_p, ref_p = _materialize_transcripts(spark, N_TURNS)
    df, ref = spark.read.parquet(cur_p), spark.read.parquet(ref_p)
    suite = default_transcript_suite(list(ROLE_VOCAB), list(TOOL_VOCAB))
    ev = SuiteEvaluator(spark, suite,
                        default_vocab_dfs(spark, list(TOOL_VOCAB)))
    res, _ = ev.evaluate(df, ref, snapshot_id=1)
    rows = sorted(
        [[r[c] for c in STABLE_COLS] for r in res.select(STABLE_COLS).collect()]
    )
    ev.unpersist_all()
    return rows


def main() -> int:
    from chronominer_spark.session import build_session

    spark = build_session("suite_golden", master="local[8]",
                          extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    rows = compute_rows(spark)
    with open(OUT, "w") as f:
        json.dump({"n_turns": N_TURNS, "stable_cols": STABLE_COLS,
                   "rows": rows}, f, indent=0)
    print(f"wrote {len(rows)} rows to {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
