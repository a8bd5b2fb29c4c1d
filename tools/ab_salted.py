"""A/B: explicit two-stage salted aggregation vs plain group-count for
the `unique` and `group_stats` constraint families.

The north rule mandates explicit skew handling ("two-stage salted
aggregation"); Spark's hash aggregate already performs a partial/final
split with map-side combining, so the interesting question is what the
*extra* exchange of the explicit salt stage costs (uniform keys) or buys
(a pathologically hot key). This tool measures both variants on both
shapes:

- uniform: the standard synthetic transcripts table (conv sizes ~equal)
- skew: same table with 20%% of rows remapped onto ONE conv_id (and a
  row-salt appended to turn_idx so the hot key stresses group sizing,
  not duplicate counting)

Each variant runs in a fresh subprocess (fresh JVM), one warmup pass,
best of two measured trials — the same protocol as bench.py's scaling
levels. Results land in BENCH/BASELINE.md.

Usage: python tools/ab_salted.py [n_turns]          # default 8,000,000
       python tools/ab_salted.py --one <salted|plain> <uniform|skew> <n_turns>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TURNS = 8_000_000


def _load(spark, n_turns: int, shape: str):
    from pyspark.sql import functions as F

    from bench import _materialize_transcripts

    cur_p, _ = _materialize_transcripts(spark, n_turns)
    df = spark.read.parquet(cur_p)
    if shape == "skew":
        # one conversation swallows ~20% of all rows; keep (conv_id,
        # turn_idx) unique-ish by widening turn_idx with the original id's
        # hash so `unique` measures aggregation cost, not violation-row
        # explosion
        hot = F.xxhash64("conv_id", "turn_idx") % 5 == 0
        df = df.withColumn(
            "turn_idx",
            F.when(hot, F.pmod(F.xxhash64("conv_id", "turn_idx"),
                               F.lit(2**31 - 1)).cast("int"))
            .otherwise(F.col("turn_idx")),
        ).withColumn(
            "conv_id", F.when(hot, F.lit("HOT")).otherwise(F.col("conv_id"))
        )
    return df


def _run_one(variant: str, shape: str, n_turns: int) -> None:
    from chronominer_spark.constraints import SuiteEvaluator
    from chronominer_spark.constraints.spec import (
        ConstraintSuite,
        group_stats,
        unique,
    )
    from chronominer_spark.session import build_session

    salted = variant == "salted"
    spark = build_session(
        "ab_salted", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g"},
    )
    df = _load(spark, n_turns, shape)
    suite = ConstraintSuite(
        name=f"ab_{variant}_{shape}",
        constraints=(unique("conv_id", "turn_idx", salted=salted),
                     group_stats("conv_id", salted=salted)),
    )

    def once() -> float:
        ev = SuiteEvaluator(spark, suite)
        t0 = time.time()
        res, vio = ev.evaluate(df, None, snapshot_id=1)
        res.count()
        vio.count()
        wall = time.time() - t0
        ev.unpersist_all()
        return wall

    once()  # warmup (JIT + page cache)
    wall = min(once(), once())
    spark.stop()
    print(json.dumps({"variant": variant, "shape": shape,
                      "wall_sec": round(wall, 3)}))


def main(n_turns: int) -> None:
    out: dict[str, dict[str, float]] = {}
    for shape in ("uniform", "skew"):
        for variant in ("salted", "plain"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", variant, shape, str(n_turns)],
                capture_output=True, text=True, check=True,
                env={**os.environ,
                     "PYTHONPATH": os.path.dirname(os.path.dirname(
                         os.path.abspath(__file__)))},
            )
            row = json.loads(proc.stdout.strip().splitlines()[-1])
            out.setdefault(shape, {})[variant] = row["wall_sec"]
            print(f"  {shape}/{variant}: {row['wall_sec']}s", file=sys.stderr)
    print(json.dumps({"n_turns": n_turns, "ab": out}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        _run_one(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_TURNS)
