"""A/B: value-free equality exchange vs the round-2 value-carrying plan.

Wall clock on a warm single box swings ±30% between trials (JIT, page
cache), so the primary metric here is DETERMINISTIC: total shuffle
write bytes per variant, read from the Spark UI REST API. The old
variant is reimplemented inline (side-tagged union whose current-side
struct carries the truncated text value); the new variant is the
engine's `_eq_turn_join`. Both are driven to the same two actions
(counts + violations) and asserted row-identical.

Usage: python tools/ab_equality_exchange.py [n_turns]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _shuffle_bytes(spark) -> tuple[int, int]:
    """(shuffle_write_bytes, input_bytes) summed over all completed
    stages of this application, via the UI REST API."""
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    done = [s for s in stages if s["status"] == "COMPLETE"]
    return (sum(s["shuffleWriteBytes"] for s in done),
            sum(s["inputBytes"] for s in done))


def old_plan(cur, ref, keys, col):
    """Round-2 `_eq_turn_join`: the current-side winner struct carries
    `_sval(col)` through the side-tagged exchange for EVERY row."""
    from chronominer_spark.functions.text import normalize_text

    sval = F.substring(F.col(col).cast("string"), 1, 256)
    sel = [*keys, "ts", col, "_pid"]
    tagged = (
        cur.select(*sel).withColumn("_is_cur", F.lit(True))
        .unionByName(ref.select(*sel).withColumn("_is_cur", F.lit(False)))
    )
    norm = normalize_text(F.col(col))
    norm_h = F.when(norm.isNull(), F.lit(None).cast("long")) \
        .otherwise(F.xxhash64(norm))
    ts_o = F.coalesce(F.col("ts").cast("timestamp").cast("long"), F.lit(0))
    h_o = F.xxhash64(F.col(col)).bitwiseXOR(F.lit(-1))
    s_cur = F.struct(ts_o.alias("__ts_o"), h_o.alias("__h_o"),
                     norm_h.alias("norm"), F.col("_pid").alias("pid"),
                     sval.alias("val"))
    s_ref = F.struct(ts_o.alias("__ts_o"), h_o.alias("__h_o"),
                     norm_h.alias("norm"), F.col("_pid").alias("pid"))
    agg = tagged.groupBy(*keys).agg(
        F.max(F.when(F.col("_is_cur"), s_cur)).alias("_cw"),
        F.max(F.when(~F.col("_is_cur"), s_ref)).alias("_rw"),
    )
    status = (
        F.when(F.col("_cw").isNull(), F.lit("missing_in_current"))
        .when(F.col("_rw").isNull(), F.lit("extra_in_current"))
        .when(F.col("_cw.norm").eqNullSafe(F.col("_rw.norm")), F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    classified = agg.select(
        *keys,
        F.coalesce("_cw.pid", "_rw.pid").alias("_pid"),
        F.col("_cw.val").alias("_cur_val"),
        status.alias("_status"),
    ).persist()
    counts = classified.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("rows_checked"),
        F.sum((F.col("_status") != "match").cast("long")).alias("violation_count"),
    )
    vio = classified.where(F.col("_status") != "match") \
        .select(*keys, "_pid", "_cur_val", "_status")
    return counts, vio, classified


def new_plan(spark, cur, ref, keys, col):
    from chronominer_spark.constraints.engine import SuiteEvaluator
    from chronominer_spark.constraints.spec import ConstraintSuite, text_equality

    c = text_equality(col)
    suite = ConstraintSuite(name="ab", constraints=(c,))
    ev = SuiteEvaluator(spark, suite)
    norm_opts = dict(lowercase=c.params["lowercase"],
                     collapse_ws=c.params["collapse_ws"],
                     strip_punct=c.params["strip_punct"],
                     strip_diacritics=c.params["strip_diacritics"])
    counts, vio = ev._eq_turn_join(cur, ref, keys, col, norm_opts, c)  # noqa: SLF001
    return counts, vio, ev


def run_variant(variant: str, n_turns: int) -> None:
    """One variant in THIS process (fresh JVM — the parent launches each
    variant as a subprocess; same-JVM back-to-back runs contaminate each
    other's heap/GC state and once produced a 7x-slower second variant).
    Warmup trial + best-of-2 measured trials; shuffle bytes are counted
    for the LAST trial only (REST deltas around it)."""
    from bench import _materialize_transcripts

    from chronominer_spark.session import build_session

    spark = build_session(
        "ab_eq", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "48g",
                    "spark.ui.enabled": "true"},  # REST metrics source
    )
    cur_p, ref_p = _materialize_transcripts(spark, n_turns)
    pid = F.format_string("p=%04d", F.col("pbucket"))
    cur = spark.read.parquet(cur_p).withColumn("_pid", pid)
    ref = spark.read.parquet(ref_p).withColumn("_pid", pid)
    cur.count()  # warm page cache
    keys = ["conv_id", "turn_idx"]

    walls, nres, nvio, sw_delta = [], None, None, 0
    for trial in range(3):  # trial 0 = warmup, discarded
        base_sw, base_in = _shuffle_bytes(spark)
        t0 = time.time()
        if variant == "old_value_carrying":
            counts, vio, handle = old_plan(cur, ref, keys, "text")
        else:
            counts, vio, handle = new_plan(spark, cur, ref, keys, "text")
        nres = sorted(map(tuple, counts.collect()))
        nvio = vio.count()
        wall = time.time() - t0
        sw, inb = _shuffle_bytes(spark)
        if hasattr(handle, "unpersist_all"):
            handle.unpersist_all()
        else:
            handle.unpersist()
        if trial > 0:
            walls.append(round(wall, 2))
            sw_delta = sw - base_sw
    print(json.dumps({
        "variant": variant,
        "walls": walls,
        "best_wall_sec": min(walls),
        "shuffle_write_mb": round(sw_delta / 1e6, 1),
        "counts3": nres[:3],
        "n_counts": len(nres),
        "n_vio": nvio,
    }, default=str))
    spark.stop()


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    import subprocess

    out = {}
    for variant in ("old_value_carrying", "new_value_free"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", variant,
             str(n_turns)],
            capture_output=True, text=True, check=True,
            env={**os.environ,
                 "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))},
        )
        out[variant] = json.loads(proc.stdout.strip().splitlines()[-1])
    same = (out["old_value_carrying"]["counts3"] == out["new_value_free"]["counts3"]
            and out["old_value_carrying"]["n_vio"] == out["new_value_free"]["n_vio"])
    out["identical_outputs"] = same
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_variant(sys.argv[2], int(sys.argv[3]))
    else:
        main()
