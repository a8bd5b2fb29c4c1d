"""Skew stress for the round-5 constraint families (verdict item 5):
``functional_dependency`` and ``group_agg_check`` claim skew-proof
shapes (the FD distinct pass hashes the dependent into the exchange
key — the dependent doubles as a salt; the group-agg is one map-side
combined hash aggregate). Plant ONE conv_id owning ~10% of an 8M-turn
table and verify the claim with task-level evidence, not just wall:

- wall seconds, skew vs uniform (same table, remapped keys);
- per-stage task durations from the Spark event log — the acceptance
  bar is NO STAGE SERIALIZATION: max task time within ~2x the median
  task time of its stage for every stage ≥ 1s of total task time.

Each shape runs in a fresh subprocess (fresh JVM), one warmup pass,
best of two measured trials — the ab_salted.py protocol. Results land
in BENCH/BASELINE.md.

Usage: python tools/skew_stress_r5.py [n_turns]      # default 8,000,000
       python tools/skew_stress_r5.py --one <uniform|skew> <n_turns>
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TURNS = 8_000_000


def _task_stats(event_dir: str, window: tuple[float, float]) -> list[dict]:
    """Parse SparkListenerTaskEnd events: per-stage (n_tasks, median,
    max) task duration, for stages with ≥1s total task time whose tasks
    LAUNCHED inside the measured-trial window (excludes datagen /
    warmup stages, which legitimately skew on the generator write)."""
    import statistics

    lo_ms, hi_ms = window[0] * 1000.0, window[1] * 1000.0
    stages: dict[int, list[float]] = {}
    for path in glob.glob(os.path.join(event_dir, "**"), recursive=True):
        if os.path.isdir(path) or "appstatus" in os.path.basename(path):
            continue
        with open(path, encoding="utf-8", errors="replace") as f:
            for line in f:
                if '"Event":"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                ti = ev.get("Task Info", {})
                if not (lo_ms <= ti.get("Launch Time", 0) <= hi_ms):
                    continue
                dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0))
                stages.setdefault(ev["Stage ID"], []).append(dur / 1000.0)
    out = []
    for sid, durs in sorted(stages.items()):
        if sum(durs) < 1.0:
            continue
        med = statistics.median(durs)
        out.append({
            "stage": sid, "n_tasks": len(durs),
            "task_med_sec": round(med, 3),
            "task_max_sec": round(max(durs), 3),
            "max_over_med": round(max(durs) / med, 2) if med > 0 else None,
        })
    return out


def _run_one(shape: str, n_turns: int) -> None:
    from pyspark.sql import functions as F

    from bench import _materialize_transcripts
    from chronominer_spark.constraints import SuiteEvaluator
    from chronominer_spark.constraints.spec import (
        ConstraintSuite,
        functional_dependency,
        group_agg_check,
    )
    from chronominer_spark.session import build_session

    event_dir = tempfile.mkdtemp(prefix="cm_skew_ev_")
    spark = build_session(
        "skew_stress_r5", master="local[32]", shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{event_dir}",
            # plain-text single-line JSON events (the default zstd
            # rolling v2 layout isn't readable without extra deps)
            "spark.eventLog.compress": "false",
        },
    )
    cur_p, _ = _materialize_transcripts(spark, n_turns)
    df = spark.read.parquet(cur_p)
    # "owner" is derived from the ORIGINAL conv_id, so conv_id -> owner
    # holds by construction on the uniform shape. The FD family checks
    # per partition, so the dependent must vary WITHIN a partition
    # (pbucket itself can never be inconsistent per pbucket).
    df = df.withColumn(
        "owner", F.pmod(F.xxhash64("conv_id"), F.lit(100)).cast("int"))
    if shape == "skew":
        # ONE conversation swallows ~10% of all rows AND carries ~100
        # distinct owners (inherited from the remapped originals): the
        # FD family must flag that one genuinely-inconsistent hot key
        # without serializing its stage on it.
        hot = F.xxhash64("conv_id", "turn_idx") % 10 == 0
        df = df.withColumn(
            "conv_id", F.when(hot, F.lit("HOT")).otherwise(F.col("conv_id")))

    suite = ConstraintSuite(
        name=f"skew_{shape}",
        constraints=(
            functional_dependency(["conv_id"], "owner"),
            group_agg_check("conv_len", "conv_id",
                            "avg(length(text))", hi=100000.0),
        ),
    )

    def once() -> tuple[float, int]:
        ev = SuiteEvaluator(spark, suite)
        t0 = time.time()
        res, vio = ev.evaluate(df, None, snapshot_id=1)
        res.count()
        nv = vio.count()
        wall = time.time() - t0
        ev.unpersist_all()
        return wall, nv

    once()  # warmup (JIT + page cache)
    t_lo = time.time()
    w1, nv = once()
    w2, _ = once()
    t_hi = time.time()
    spark.stop()
    time.sleep(1.0)  # let the event log flush
    print(json.dumps({
        "shape": shape, "wall_sec": round(min(w1, w2), 3),
        "violation_rows": nv,
        "stages": _task_stats(event_dir, (t_lo, t_hi)),
    }))


def main(n_turns: int) -> None:
    out = {}
    for shape in ("uniform", "skew"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--one", shape, str(n_turns)],
            capture_output=True, text=True, check=True,
            env={**os.environ,
                 "PYTHONPATH": os.path.dirname(os.path.dirname(
                     os.path.abspath(__file__)))},
        )
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        out[shape] = row
        worst = max((s["max_over_med"] or 0) for s in row["stages"]) \
            if row["stages"] else None
        print(f"  {shape}: wall {row['wall_sec']}s, "
              f"worst max/med {worst}", file=sys.stderr)
    print(json.dumps({"n_turns": n_turns, "skew_stress": out}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        _run_one(sys.argv[2], int(sys.argv[3]))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_TURNS)
