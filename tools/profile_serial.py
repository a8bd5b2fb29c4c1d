"""Where does the suite wall go at high parallelism? Splits one
`_run_suite`-shaped draw into its serial/driver phases vs cluster
phases, at a given local[N]:

  phase 1  evaluate()      — Catalyst analysis + eager probe actions
  phase 2  res.count()     — the main cluster job (all family scans)
  phase 3  vio.count()     — violations job (reuses persisted shares)

Usage: python tools/profile_serial.py <cores> [n_turns] [trials]

Evidence harness for the round-5 verdict item 1 (8->32-core efficiency
0.543): if phase 1+3 is flat across N while phase 2 scales, the serial
fraction is driver planning + the second action, and the fix is
concurrent materialization, not a different plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from bench import _materialize_transcripts, _session
    from chronominer_spark.constraints import SuiteEvaluator
    from chronominer_spark.constraints.spec import (
        default_transcript_suite,
        default_vocab_dfs,
    )
    from chronominer_spark.datagen import ROLE_VOCAB, TOOL_VOCAB

    spark = _session(cores, shuffle=int(cores))
    cur_p, ref_p = _materialize_transcripts(spark, n_turns)
    df = spark.read.parquet(cur_p)
    ref = spark.read.parquet(ref_p)
    rows = df.count()

    suite = default_transcript_suite(list(ROLE_VOCAB), list(TOOL_VOCAB))
    out = []
    for trial in range(trials + 1):  # +1 warmup, discarded
        ev = SuiteEvaluator(spark, suite,
                            default_vocab_dfs(spark, list(TOOL_VOCAB)))
        t0 = time.time()
        res, vio = ev.evaluate(df, ref, snapshot_id=1)
        t1 = time.time()
        res.count()
        t2 = time.time()
        vio.count()
        t3 = time.time()
        ev.unpersist_all()
        rec = {
            "trial": "warmup" if trial == 0 else trial,
            "evaluate_sec": round(t1 - t0, 3),
            "res_count_sec": round(t2 - t1, 3),
            "vio_count_sec": round(t3 - t2, 3),
            "total_sec": round(t3 - t0, 3),
            "turns_per_sec": round(rows / (t3 - t0), 1),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    spark.stop()
    best = min(out[1:], key=lambda r: r["total_sec"])
    print(json.dumps({"cores": cores, "turns": rows, "best": best}))


if __name__ == "__main__":
    main()
