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

Every draw begins with a host-health sentinel (CPU 1-way/32-way + warm
fsync'd write vs stored healthy-band floors) whose verdict is stamped
into the JSON as "host_health" — a draw taken in a degraded host
window (the BENCH_r04 phantom-regression failure mode) is labeled, not
trusted. Pass --strict to refuse the draw (exit 4) when degraded.
"queries" is the frozen round-2 headline list; "queries_r4" times
representatives of the later families separately.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The timed list below is FROZEN at its round-2 composition for
# round-over-round comparability. Representatives of families added
# since are timed in the separately-reported queries_r4 section.
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
    "q26_lsh_ann_topk",
    "q33_token_budget_chunks",
    "q35_embedding_near_dups",
]

# Healthy-band floors for the pre-flight host sentinel, calibrated on
# this sandbox host on an idle morning (2026-08-18: 1-way sha256
# 1288 MB/s, 32-way scale 14.7x, warm 256 MiB fsync'd write
# 447-482 MB/s, load < 1). Floors sit at ~50-60% of healthy so the
# documented ±16-18% between-JVM band never trips them; the evening
# host pathology (cold/write phases 1.5-3x slower) does.
#
# Portability (round-5 ADVICE): the parallel-scale floor is capped at
# half the visible core count — a fixed 8.0 would label every <16-core
# host permanently degraded. Each floor is also overridable via
# CM_HEALTH_FLOOR_<NAME> env vars for hosts whose healthy band differs.


def _health_floors() -> dict:
    cpus = os.cpu_count() or 32
    floors = {
        "cpu_1way_mbps": 700.0,
        "cpu_parallel_scale": min(8.0, 0.5 * min(32, cpus)),
        "fsync_mbps": 150.0,
        "load1_max": 4.0,
    }
    for k in floors:
        env = os.environ.get(f"CM_HEALTH_FLOOR_{k.upper()}")
        if env is not None:
            floors[k] = float(env)
    return floors


HEALTH_FLOORS = _health_floors()

# round-4/5 additions tracked in their own timed section (BENCH_QUERIES
# stays frozen): the always-on constraint families (conversation shape,
# contiguity, categorical drift), the sketch/temporal operators, and
# the flagship equality family
BENCH_QUERIES_R4 = [
    "q53_heavy_hitters",
    "q57_contiguity_check",
    "q58_categorical_drift",
    "q60_conversation_shape",
    "q62_asof_state_join",
    "q64_session_interval_join",
    "q66_text_equality_audit",
]

SUITE_TURNS = int(os.environ.get("SPARK_GRAFT_SUITE_TURNS", "2000000"))
# scaling runs need a compute-bound workload: below ~8M turns the suite
# finishes in seconds and fixed job-scheduling overhead dominates,
# understating parallel efficiency
SCALING_TURNS = int(os.environ.get("SPARK_GRAFT_SCALING_TURNS", "8000000"))


def _host_health(hash_mib: int = 256, write_mib: int = 256) -> dict:
    """Pre-flight host sentinel (round-4 verdict task: BENCH_r04.json
    silently recorded a degraded-host window as a phantom 2.4x
    regression). Three microbenchmarks — single-thread sha256 rate,
    32-thread aggregate scale (hashlib releases the GIL), and a warm
    fsync'd write (first write discarded: cold page cache) — plus the
    1-min load average, each compared to the stored healthy-band
    floors. The stamp rides in the bench JSON so a draw taken on a sick
    machine is LABELED, not trusted.

    ``hash_mib``/``write_mib`` size the probes; production draws use
    the calibrated 256 MiB defaults, the unit test shrinks them (the
    floor/shape logic is what it asserts — round-5 ADVICE)."""
    import concurrent.futures
    import hashlib
    import tempfile

    def hash_mb(mb: int) -> None:
        h = hashlib.sha256()
        blk = b"\xab" * (1 << 20)
        for _ in range(mb):
            h.update(blk)
        h.hexdigest()

    t0 = time.perf_counter()
    hash_mb(hash_mib)
    one_way = hash_mib / (time.perf_counter() - t0)

    def parallel_scale() -> float:
        nthr = min(32, os.cpu_count() or 32)
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(nthr) as ex:
            list(ex.map(hash_mb, [hash_mib] * nthr))
        return (nthr * hash_mib / (time.perf_counter() - t0)) / one_way

    # best-of-2 on the probes with cold-start asymmetry (thread-pool
    # spin-up, cold page cache): a transient first-draw dip must not
    # mislabel a healthy host, while the sustained 1.5-3x pathology
    # this sentinel exists for fails BOTH draws
    scale = max(parallel_scale(), parallel_scale())

    def fsync_write(mib: int) -> float:
        fd, p = tempfile.mkstemp(prefix="cm_health_")
        blk = b"\xcd" * (4 << 20)
        t0 = time.perf_counter()
        try:
            with os.fdopen(fd, "wb") as f:
                for _ in range(max(1, mib // 4)):
                    f.write(blk)
                f.flush()
                os.fsync(f.fileno())
            return max(4, mib) / (time.perf_counter() - t0)
        finally:
            os.unlink(p)

    fsync_write(max(4, write_mib // 4))   # throwaway: cold-cache write
    fsync_mbps = max(fsync_write(write_mib), fsync_write(write_mib))
    load1 = os.getloadavg()[0]

    measured = {
        "cpu_1way_mbps": round(one_way, 1),
        "cpu_parallel_scale": round(scale, 2),
        "fsync_mbps": round(fsync_mbps, 1),
        "load1": round(load1, 2),
    }
    failed = [k for k in ("cpu_1way_mbps", "cpu_parallel_scale",
                          "fsync_mbps")
              if measured[k] < HEALTH_FLOORS[k]]
    if load1 > HEALTH_FLOORS["load1_max"]:
        failed.append("load1")
    return {
        "status": "degraded" if failed else "ok",
        "failed_checks": failed,
        **measured,
        "floors": HEALTH_FLOORS,
    }


def _warmup(spark, sf_dir: str) -> None:
    """One throwaway action touching the bench tables BEFORE the per-query
    loop: JVM/codegen/JIT warmup and parquet footer caching otherwise
    land entirely on the first timed query (q01 measured ~5x its warm
    wall in round 2), making round-over-round per-query deltas noisy."""
    from pyspark.sql import functions as F

    from chronominer_spark.queries import QUERIES

    for tbl in ("lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet") \
            .agg(F.count(F.lit(1))).collect()
    # one real whole-stage-codegen aggregation, untimed
    QUERIES["q01_pricing_summary"](spark, sf_dir).count()


def _run_queries(spark, sf_dir: str,
                 names: list[str] | None = None) -> dict[str, float]:
    from chronominer_spark.queries import QUERIES

    times: dict[str, float] = {}
    for name in (names if names is not None else BENCH_QUERIES):
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        assert n >= 0
    return times


def _materialize_transcripts(spark, n_turns: int) -> tuple[str, str]:
    """Generate the synthetic transcripts + reference snapshot ONCE and
    land them as parquet (partitioned by pbucket). The suite then
    validates an on-disk table — the real deployment shape — instead of
    a cached frame that 32-thread execution memory can evict (evicted
    cache silently re-runs the generator per scan and wrecks scaling
    numbers)."""
    import tempfile

    from chronominer_spark.datagen import (
        TranscriptGenConfig,
        generate_reference_snapshot,
        generate_transcripts,
    )

    key = f"{n_turns}"
    root = os.path.join(tempfile.gettempdir(), f"cm_bench_{key}")
    cur_p, ref_p = os.path.join(root, "cur"), os.path.join(root, "ref")
    if not os.path.exists(os.path.join(cur_p, "_SUCCESS")):
        cfg = TranscriptGenConfig(n_turns=n_turns,
                                  n_convs=max(200, n_turns // 200))
        generate_transcripts(spark, cfg).write.mode("overwrite") \
            .partitionBy("pbucket").parquet(cur_p)
        generate_reference_snapshot(spark, cfg).write.mode("overwrite") \
            .partitionBy("pbucket").parquet(ref_p)
    return cur_p, ref_p


def _run_suite(spark, n_turns: int, fingerprint: bool = False):
    """Constraint-suite throughput on synthetic transcripts (the
    BASELINE.json metric: turns validated/sec, end-to-end including the
    equality/drift comparison against the reference snapshot)."""
    from chronominer_spark.constraints import SuiteEvaluator
    from chronominer_spark.constraints.spec import default_transcript_suite
    from chronominer_spark.datagen import ROLE_VOCAB, TOOL_VOCAB

    cur_p, ref_p = _materialize_transcripts(spark, n_turns)
    df = spark.read.parquet(cur_p)
    ref = spark.read.parquet(ref_p)
    rows = df.count()

    from chronominer_spark.constraints.spec import default_vocab_dfs
    suite = default_transcript_suite(list(ROLE_VOCAB), list(TOOL_VOCAB))
    ev = SuiteEvaluator(spark, suite, default_vocab_dfs(spark, list(TOOL_VOCAB)))
    t0 = time.time()
    res, vio = ev.evaluate(df, ref, snapshot_id=1)
    if os.environ.get("CM_CONCURRENT_OUTPUTS") == "1":
        # opt-in overlap of the two output jobs (FAIR pools). Measured
        # round 6: at 8M the gain is inside between-draw noise, and at
        # 80M it is a 9% LOSS (455 s sequential vs 500 s concurrent,
        # identical fps) — the concurrent violations job re-computes
        # the persisted shares the results job is still building
        # (BlockManager admits the duplicate work), and at 10× input
        # those shares are expensive. Sequential res-then-vio lets vio
        # read the populated cache — hence the default.
        from chronominer_spark.plans.actions import run_concurrent
        run_concurrent(spark, {"res": res.count, "vio": vio.count})
    else:
        res.count()
        vio.count()
    wall = time.time() - t0

    fp = None
    if fingerprint:
        # identity evidence across parallelism levels: fingerprint the
        # deterministic columns (approx-sketch observed values excluded,
        # see tests/test_parallelism_invariance.py)
        from chronominer_spark.functions.keys import dataset_fingerprint
        stable = res.select("partition_id", "constraint_id", "snapshot_id",
                            "passed", "rows_checked", "violation_count")
        fp = (dataset_fingerprint(stable), dataset_fingerprint(vio))
    ev.unpersist_all()
    return wall, rows, fp


def _run_runner(spark, n_turns: int) -> tuple[float, int]:
    """End-to-end SuiteRunner wall: evaluate + results/violations parquet
    writes (dynamic partition overwrite, incl. the zero-violation
    sentinels) + manifest commit — the previously-untimed write path."""
    import shutil
    import tempfile

    from chronominer_spark.constraints.spec import (
        default_transcript_suite,
        default_vocab_dfs,
    )
    from chronominer_spark.datagen import ROLE_VOCAB, TOOL_VOCAB
    from chronominer_spark.runner import SuiteRunner

    cur_p, ref_p = _materialize_transcripts(spark, n_turns)
    df = spark.read.parquet(cur_p)
    ref = spark.read.parquet(ref_p)
    out_root = tempfile.mkdtemp(prefix="cm_bench_runner_")
    try:
        runner = SuiteRunner(
            spark, default_transcript_suite(list(ROLE_VOCAB), list(TOOL_VOCAB)),
            out_root, vocab_dfs=default_vocab_dfs(spark, list(TOOL_VOCAB)),
        )
        t0 = time.time()
        s = runner.run(df, ref, snapshot_id=1)
        wall = time.time() - t0
        assert s.status == "complete", s.status
        return wall, s.rows_validated
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


def _session(cpus: str, shuffle: int):
    """local[cpus] session, or — when SPARK_GRAFT_MASTER is set — that
    master verbatim (e.g. ``local-cluster[8,4,8192]``: 8 separate
    executor JVMs × 4 cores × 8 GiB on this box, the closest sandbox
    analog of a real multi-executor deployment; used by the scaling
    campaign to separate JVM-internal ceilings from machine ceilings)."""
    from chronominer_spark.session import build_session

    master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    if master.startswith("local-cluster"):
        os.environ.setdefault("SPARK_HOME", __import__("pyspark").__path__[0])
        os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    extra = {"spark.driver.memory":
             os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")}
    if master.startswith("local-cluster"):
        # driver-side memory can be slimmer; executors carry the heap
        extra["spark.driver.memory"] = os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "8g")
    return build_session(
        "bench", master=master, shuffle_partitions=shuffle, extra_conf=extra,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    health = _host_health()
    if health["status"] == "degraded" and "--strict" in sys.argv[1:]:
        print(json.dumps({"error": "host degraded, --strict refused draw",
                          "host_health": health}), file=sys.stderr)
        sys.exit(4)

    spark = _session(cpus, shuffle=max(8, int(cpus)))
    t0 = time.time()
    _warmup(spark, sf_dir)
    qtimes = _run_queries(spark, sf_dir)
    suite_wall, suite_rows, _ = _run_suite(spark, SUITE_TURNS)
    runner_wall, runner_rows = _run_runner(spark, SUITE_TURNS)
    # legacy headline stops HERE: end_to_end_sec keeps its round-2
    # composition so round-over-round deltas stay meaningful; the r4
    # section is timed after it and reported separately
    total = round(time.time() - t0, 3)
    qtimes_r4 = _run_queries(spark, sf_dir, BENCH_QUERIES_R4)
    turns_per_sec = round(suite_rows / suite_wall, 1)
    spark.stop()

    out = {
        "metric": "end_to_end_sec",
        "value": total,
        "unit": "sec",
        "host_health": health,
        "queries": qtimes,
        "queries_r4": qtimes_r4,
        "sf": sf,
        "suite": {
            "turns": suite_rows,
            "wall_sec": round(suite_wall, 3),
            "turns_per_sec": turns_per_sec,
            "runner_wall_sec": round(runner_wall, 3),
            "runner_turns_per_sec": round(runner_rows / runner_wall, 1),
        },
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # each parallelism level runs in a FRESH subprocess (fresh JVM):
        # a JVM that already ran other sessions carries heap/thread state
        # that degrades later local[N] runs and corrupts the comparison —
        # on a real cluster the two "sizes" are separate deployments.
        import subprocess

        import shutil

        scaling = {}
        fps = {}
        for n in ("2", "8", "32"):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--scale-one", n, str(SCALING_TURNS)]
            if shutil.which("taskset"):
                # pin to exactly N cores: in local[N] the JVM's GC /
                # shuffle / IO threads otherwise spill onto all cores and
                # inflate the small-N baseline
                cmd = ["taskset", "-c", f"0-{int(n) - 1}"] + cmd
            proc = subprocess.run(
                cmd,
                capture_output=True, text=True, check=True,
                env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))},
            )
            row = json.loads(proc.stdout.strip().splitlines()[-1])
            scaling[f"local[{n}]"] = {
                "wall_sec": row["wall_sec"],
                "turns_per_sec": row["turns_per_sec"],
                "results_fp": row["fp"][0], "violations_fp": row["fp"][1],
            }
            fps[n] = tuple(row["fp"])
        tp = {n: scaling[f"local[{n}]"]["turns_per_sec"] for n in ("2", "8", "32")}
        # per-core-normalized efficiency between N and 4N parallelism,
        # at two operating points: 2→8 cores (no single-box bandwidth
        # saturation — the cluster-like regime) and 8→32 (the box's
        # memory-bandwidth/shuffle-disk ceiling; see BENCH/BASELINE.md)
        scaling["efficiency_Nto4N_2_8"] = round((tp["8"] / tp["2"]) / 4.0, 3)
        scaling["efficiency_Nto4N_8_32"] = round((tp["32"] / tp["8"]) / 4.0, 3)
        scaling["identical_results"] = fps["2"] == fps["8"] == fps["32"]
        out["scaling"] = scaling

    print(json.dumps(out))


def scale_one(cores: str, n_turns: int) -> None:
    """One parallelism level, steady state: a warmup pass first (JVM JIT
    + page cache — a fresh JVM's first suite run is 2-5x slower than its
    second, which would otherwise dominate the comparison), then the
    best of two measured trials. SPARK_GRAFT_WARMUP_TURNS can shrink the
    warmup input (JIT/codegen warmup doesn't need the full table; the
    80M-turn campaign warms at 8M to halve campaign wall)."""
    spark = _session(cores, shuffle=int(cores))
    warm_turns = int(os.environ.get("SPARK_GRAFT_WARMUP_TURNS", n_turns))
    _run_suite(spark, warm_turns)  # warmup (discarded)
    walls = []
    fp = None
    # local-cluster levels take ~2x local[] wall; SPARK_GRAFT_SCALE_TRIALS=1
    # keeps a level inside the sandbox job timeout (protocol unchanged
    # otherwise: fresh JVM, discarded warmup, pinned cores)
    trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))
    for _ in range(trials):
        wall, rows, fp = _run_suite(spark, n_turns, fingerprint=True)
        walls.append(wall)
    wall = min(walls)
    spark.stop()
    print(json.dumps({
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(rows / wall, 1),
        "fp": list(fp),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-one":
        if len(sys.argv) < 4:
            print("usage: bench.py --scale-one <cores> <n_turns>",
                  file=sys.stderr)
            sys.exit(2)
        scale_one(sys.argv[2], int(sys.argv[3]))
    else:
        main()
