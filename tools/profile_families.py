"""Per-family suite profiling at bench scale: time isolated suites
(equality / drift / unique+gstats / row checks) on the materialized 8M
transcripts, warm JVM, 2 trials each — the evidence harness for plan
reworks (value-free equality exchange, fused drift scans, unique+gstats
scan sharing).

Usage: python tools/profile_families.py [n_turns] [families...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    only = set(sys.argv[2:])

    from bench import _materialize_transcripts, _session
    from chronominer_spark.constraints import SuiteEvaluator
    from chronominer_spark.constraints.spec import (
        ConstraintSuite,
        column_stats,
        cross_field_null,
        drift_ks,
        drift_psi,
        group_stats,
        in_range,
        matches,
        not_empty,
        not_null,
        quantiles,
        referential,
        text_equality,
        unique,
    )
    from chronominer_spark.datagen import ROLE_VOCAB

    spark = _session(os.environ.get("SPARK_GRAFT_CPUS", "32"), shuffle=32)
    cur_p, ref_p = _materialize_transcripts(spark, n_turns)
    df = spark.read.parquet(cur_p)
    ref = spark.read.parquet(ref_p)
    df.count()  # warm page cache + JVM

    fams: dict[str, tuple] = {
        "equality": (text_equality("text"),),
        "equality_digest": (text_equality("text", digest=True),),
        "drift": (drift_psi("length(text)", bins=16, lo=0.0, hi=2000.0),
                  drift_ks("length(text)", bins=16, lo=0.0, hi=2000.0)),
        "unique_gstats": (unique("conv_id", "turn_idx"),
                          group_stats("conv_id", max_group_rows=100_000)),
        "rowchecks": (not_null("conv_id"), not_null("turn_idx"),
                      not_null("role"), not_empty("text"),
                      referential("role", vocab=list(ROLE_VOCAB),
                                  allow_null=False),
                      in_range("turn_idx", lo=1),
                      matches("conv_id", pattern=r"^conv-"),
                      cross_field_null("text", ["tool"]),
                      column_stats("turn_idx"),
                      quantiles("length(text)", qs=[0.5, 0.9, 0.99])),
    }
    out = {}
    for name, cons in fams.items():
        if only and name not in only:
            continue
        suite = ConstraintSuite(name=f"prof_{name}", constraints=cons)
        walls = []
        for _ in range(2):
            ev = SuiteEvaluator(spark, suite)
            t0 = time.time()
            res, vio = ev.evaluate(df, ref, snapshot_id=1)
            res.count()
            vio.count()
            walls.append(round(time.time() - t0, 2))
            ev.unpersist_all()
        out[name] = {"walls": walls, "best": min(walls)}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"n_turns": n_turns, "families": out}))


if __name__ == "__main__":
    main()
