"""Benchmark runner.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

The headline metric is end-to-end wall seconds for the full query set;
"turns_per_sec" reports the constraint-suite throughput on the synthetic
transcripts table (the BASELINE.json metric). Set SPARK_GRAFT_SCALING=1
to additionally run the suite at two parallelism levels (local[8] vs
local[32]) and report per-core scaling efficiency (the sandbox evidence
protocol for the N-vs-4N-executors criterion — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_unique_key_check",
    "q04_ri_orders_customer",
    "q05_merge_new_wins",
    "q06_last_wins_dedup",
    "q08_topk_per_segment",
    "q09_sessionize",
    "q11_eval_metrics",
    "q13_rollup_accounting",
    "q14_drift_psi",
    "q16_token_stats",
    "q17_exact_dedup",
    "q19_lsh_jaccard_pairs",
    "q21_embedding_topk",
    "q22_quality_scores",
    "q24_windowed_event_counts",
]

SUITE_TURNS = int(os.environ.get("SPARK_GRAFT_SUITE_TURNS", "2000000"))


def _run_queries(spark, sf_dir: str) -> dict[str, float]:
    from chronominer_spark.queries import QUERIES

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        assert n >= 0
    return times


def _run_suite(spark, n_turns: int) -> tuple[float, int]:
    """Constraint-suite throughput on synthetic transcripts (the
    BASELINE.json metric: turns validated/sec, end-to-end including the
    equality/drift comparison against the reference snapshot)."""
    from chronominer_spark.constraints import SuiteEvaluator
    from chronominer_spark.constraints.spec import default_transcript_suite
    from chronominer_spark.datagen import (
        ROLE_VOCAB,
        TOOL_VOCAB,
        TranscriptGenConfig,
        generate_reference_snapshot,
        generate_transcripts,
    )

    cfg = TranscriptGenConfig(n_turns=n_turns, n_convs=max(200, n_turns // 200))
    df = generate_transcripts(spark, cfg).cache()
    ref = generate_reference_snapshot(spark, cfg).cache()
    rows = df.count()
    ref.count()

    suite = default_transcript_suite(list(ROLE_VOCAB), list(TOOL_VOCAB))
    ev = SuiteEvaluator(spark, suite)
    t0 = time.time()
    res, vio = ev.evaluate(df, ref, snapshot_id=1)
    res.count()
    vio.count()
    wall = time.time() - t0
    df.unpersist()
    ref.unpersist()
    return wall, rows


def _session(cpus: str, shuffle: int):
    from chronominer_spark.session import build_session

    return build_session(
        "bench", master=f"local[{cpus}]", shuffle_partitions=shuffle,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")},
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    spark = _session(cpus, shuffle=max(8, int(cpus)))
    t0 = time.time()
    qtimes = _run_queries(spark, sf_dir)
    suite_wall, suite_rows = _run_suite(spark, SUITE_TURNS)
    total = round(time.time() - t0, 3)
    turns_per_sec = round(suite_rows / suite_wall, 1)
    spark.stop()

    out = {
        "metric": "end_to_end_sec",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "suite": {
            "turns": suite_rows,
            "wall_sec": round(suite_wall, 3),
            "turns_per_sec": turns_per_sec,
        },
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        scaling = {}
        for n in ("8", "32"):
            s = _session(n, shuffle=int(n))
            wall, rows = _run_suite(s, SUITE_TURNS)
            scaling[f"local[{n}]"] = {
                "wall_sec": round(wall, 3),
                "turns_per_sec": round(rows / wall, 1),
            }
            s.stop()
        tp8 = scaling["local[8]"]["turns_per_sec"]
        tp32 = scaling["local[32]"]["turns_per_sec"]
        # per-core-normalized efficiency between N and 4N parallelism
        scaling["efficiency_Nto4N"] = round((tp32 / tp8) / 4.0, 3)
        out["scaling"] = scaling

    print(json.dumps(out))


if __name__ == "__main__":
    main()
